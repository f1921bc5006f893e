"""Batch orchestration: directory processing, schedules, retries.

The reference's L7 is cron + shell (``acquisition/crontab:1-3``: sample at
:03/:45 of odd hours, process at :53; ``goprocess.sh``: gzip old archives,
launch 3 parallel octave jobs, move processed inputs to ``donetw/``;
``gosampling.sh:13-18``: retry acquisition until the output file is
non-trivial).  Here those behaviors are plain functions — schedulable by
cron, systemd or any driver — plus a directory batch runner with the same
idempotent-resume contract.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
import time
from dataclasses import dataclass
from typing import Callable

from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig, StationConfig
from amaranth_twstft_tpu.utils import io, matio

__all__ = [
    "next_sampling_window",
    "next_processing_time",
    "retry_until_valid",
    "process_directory",
    "gzip_archives",
    "follow_capture",
]


def next_sampling_window(now: _dt.datetime) -> tuple[_dt.datetime, float]:
    """Next acquisition window start + duration (s).

    Reference cron: ``3,45`` minutes past **odd** hours, 5.5-minute
    captures (``acquisition/crontab:1-2``, ``rx_multi_samples.cpp:38``).
    """
    cand = []
    for day_offset in (0, 1):
        base = (now + _dt.timedelta(days=day_offset)).replace(
            minute=0, second=0, microsecond=0
        )
        for h in range(24):
            if h % 2 == 0:  # crontab "1-23/2" = odd hours
                continue
            for m in (3, 45):
                t = base.replace(hour=h) + _dt.timedelta(minutes=m)
                if t > now:
                    cand.append(t)
    return min(cand), 330.0


def next_processing_time(now: _dt.datetime) -> _dt.datetime:
    """Processing fires at :53 of odd hours (``acquisition/crontab:3``)."""
    cand = []
    for day_offset in (0, 1):
        base = (now + _dt.timedelta(days=day_offset)).replace(
            minute=53, second=0, microsecond=0
        )
        for h in range(24):
            if h % 2 == 0:
                continue
            t = base.replace(hour=h)
            if t > now:
                cand.append(t)
    return min(cand)


def retry_until_valid(
    action: Callable[[], str],
    validate: Callable[[str], bool],
    attempts: int = 5,
    delay_s: float = 1.0,
    on_retry: Callable[[], None] | None = None,
) -> str | None:
    """Run ``action`` until ``validate(result)`` — the acquisition retry
    loop (``gosampling.sh:13-18``: loop until file2.bin > 10 blocks, with
    a device reset between attempts)."""
    for i in range(attempts):
        out = action()
        if validate(out):
            return out
        if on_retry:
            on_retry()
        time.sleep(delay_s)
    return None


@dataclass
class BatchReport:
    processed: list[str]
    skipped: list[str]
    failed: list[tuple[str, str]]


def process_directory(
    datadir: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig | None = None,
    station: StationConfig | None = None,
    chain: str = "claudio",
    pattern: str | None = None,
    remote: bool = False,
    ranging: bool = True,
    gzip_outputs: bool = True,
    move_done: bool = True,
    **chain_kwargs,
) -> BatchReport:
    """Process every unprocessed capture in ``datadir`` (goprocess.sh).

    ``chain``: ``claudio`` (single-channel files ``*_{1,2}.bin``),
    ``godual`` or ``goranging`` (dual-channel ``1*.bin``).  Outputs are
    gzipped and inputs moved to ``donetw/`` on success
    (``claudio_...separate.m:210-215``).
    """
    from amaranth_twstft_tpu.models import claudio, godual, goranging

    proc = proc or ProcessingConfig()
    station = station or StationConfig()
    if pattern is None:
        pattern = (
            f"*_{station.remote_channel}.bin" if chain == "claudio" else "1*.bin"
        )
    report = BatchReport([], [], [])
    for cap in sorted(glob.glob(os.path.join(datadir, pattern))):
        try:
            if chain == "claudio":
                out = claudio.process_file(
                    cap, code_path, signal, proc, station,
                    remote=remote, ranging=ranging, **chain_kwargs,
                )
            elif chain == "godual":
                out = godual.process_file(
                    cap, code_path, signal, proc, station,
                    remote=remote, **chain_kwargs,
                )
            elif chain == "goranging":
                out = goranging.process_file(
                    cap, code_path, signal, proc, remote=remote, **chain_kwargs
                )
            else:
                raise ValueError(f"unknown chain {chain!r}")
        except Exception as e:  # noqa: BLE001 — keep the batch going
            report.failed.append((cap, repr(e)))
            continue
        if out is None:
            report.skipped.append(cap)
            continue
        if gzip_outputs and out.get("mat_path"):
            matio.gzip_file(out["mat_path"])
        if move_done:
            io.move_to_done(cap)
        report.processed.append(cap)
    return report


def follow_capture(
    path: str,
    signal: SignalConfig,
    *,
    channels: int = 2,
    epochs_per_batch: int = 25,
    poll_s: float = 0.2,
    timeout_s: float = 10.0,
    stop_when_idle: bool = False,
):
    """Near-real-time monitor of a *growing* capture file.

    The reference streams X310 samples over ZMQ into a live Qt display
    (``experiments/2403/x310_twstft_gr.py``, ``zmq_rx.py:1-285``); the
    file-level equivalent here tails the capture as the SDR writes it and
    yields ``(epoch_index, channel, iq_batch)`` tuples as soon as a full
    batch of code periods is available per channel.  Stops after
    ``timeout_s`` without growth (acquisition ended), or as soon as no
    new full batch is buffered when ``stop_when_idle`` (for tests).
    """
    L = signal.samples_per_code
    consumed = 0  # complete batches yielded
    idle = 0.0
    while True:
        try:
            avail = io.n_samples_sc16(path, channels=channels)
        except OSError:
            avail = 0
        ready = int(avail // (epochs_per_batch * L))
        if ready > consumed:
            idle = 0.0
            for b in range(consumed, ready):
                d, n = io.read_sc16_epochs(
                    path,
                    b * epochs_per_batch * L,
                    epochs_per_batch,
                    L,
                    channels=channels,
                )
                if n == 0:
                    break
                for ch in range(channels):
                    yield b * epochs_per_batch, ch, d[ch]
            consumed = ready
        else:
            if stop_when_idle:
                return
            idle += poll_s
            if idle >= timeout_s:
                return
            time.sleep(poll_s)


def gzip_archives(directory: str, pattern: str = "*.mat") -> list[str]:
    """gzip bare archives in a directory (``goprocess.sh`` preamble)."""
    done = []
    for p in sorted(glob.glob(os.path.join(directory, pattern))):
        done.append(matio.gzip_file(p))
    return done
