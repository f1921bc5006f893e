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

#: Measured p99 |delay error| of the int8 transfer format vs the
#: float64 oracle at the -13 dB operating point (CPU study
#: ``studies.f16_ingest_error_study`` 39.9 ps over 1024 epochs;
#: on-device 11.9 ps — PARITY.md deviation 10, regression-checked by
#: ``tests_tpu/``).  Formats below this budget ship raw sc16 (exact).
I8_PARITY_P99_NS = 0.040


def _pack_prepass(x, in_dtype):
    """Pack a (decimated) complex pre-pass array for the h2d boundary in
    the run's transfer format.  int8 mode quantizes WITHOUT carrying a
    scale: the df pre-pass is a squaring-spectrum argmax, which is
    scale-invariant, so the quantized units feed it directly (halves the
    pre-pass bytes on the byte-rate-bound tunnel).  int16 packs the sc16
    samples verbatim (they are int16-valued by construction)."""
    import numpy as np

    from amaranth_twstft_tpu.ops import boundary

    if np.dtype(in_dtype) == np.int8:
        ri = boundary.pack_complex(x, dtype=np.float32)
        s = max(float(np.abs(ri).max()), 1.0) / 127.0
        return np.clip(np.round(ri / s), -127, 127).astype(np.int8)
    return boundary.pack_complex(x, dtype=in_dtype)


def _resolve_ingest_dtype(
    ingest_dtype: str | None, parity_ns: float | None, accel: bool
) -> str:
    """Pick the ingest dtype from an explicit request or a parity budget.

    ``parity_ns`` is the caller's acceptable |delay error| vs the float64
    oracle; the cheapest transfer format whose MEASURED p99 error (with a
    2x safety factor) fits the budget is selected:

    - budget >= 80 ps -> int8 (half the bytes of sc16/f16; the 0.1 ns
      north-star budget lands here),
    - below that      -> int16 (the sc16 wire format shipped raw: zero
      host conversion, device casts exactly — bit-identical to float32
      ingest at HALF its bytes).

    Without a budget, accelerators default to int16 (bit-exact) and CPU
    to float32 (the device arrays are host arrays there; nothing ships).
    ``sc16`` is accepted as an alias for ``int16``; ``float16`` /
    ``float32`` remain as explicit requests (f16 parity p99 0.69 ps —
    superseded by int16 which costs the same bytes for zero error).
    """
    if ingest_dtype is not None:
        return "int16" if ingest_dtype == "sc16" else ingest_dtype
    if not accel:
        return "float32"
    if parity_ns is not None and parity_ns >= 2.0 * I8_PARITY_P99_NS:
        return "int8"
    return "int16"

def _prepass_df(capture_path, proc, signal, foffset_hz, in_dtype, accel,
                n_chan):
    """The per-file df pre-pass shared by both capture pipelines.

    Decimate-by-N bounded-prefix read -> squaring-FFT argmax per channel
    (the C++ chain's fixed per-file df, ``main.cpp:363-450``; channel 2
    searches the WHOLE spectrum — the ``main.cpp:442`` quirk).  The
    window is capped at PREPASS_MAX_SAMPLES decimated samples so only a
    constant prefix of the capture is paged in.  Returns ([df...],
    wall_seconds)."""
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops.doppler import (
        PREPASS_MAX_SAMPLES,
        bound_prepass_window,
        per_file_df,
        per_file_df_ri,
    )

    t0 = time.time()
    dec = io.decimate_sc16(
        capture_path, proc.df_decimation, channels=2,
        max_out=PREPASS_MAX_SAMPLES,
    )
    dec = bound_prepass_window(dec)
    if dec.shape[-1] == 0:
        # empty/sub-frame capture (acquisition restart leftovers): a
        # clean error beats the zero-size-reduction crash deep in the
        # quantizer/argmax
        raise ValueError(
            f"capture {capture_path!r} is empty (no complete frames) — "
            "nothing to process"
        )

    def _pfd(x, windowed):
        if accel:
            return per_file_df_ri(
                jnp.asarray(_pack_prepass(x, in_dtype)),
                signal.fs,
                proc.df_decimation, foffset_hz=foffset_hz,
                windowed=windowed,
            )
        return per_file_df(
            jnp.asarray(x), signal.fs, proc.df_decimation,
            foffset_hz=foffset_hz, windowed=windowed,
        )

    dfs = [float(_pfd(dec[0], True))]
    if n_chan == 2:
        dfs.append(float(_pfd(dec[1], False)))  # main.cpp:442 quirk
    return dfs, time.time() - t0


__all__ = [
    "next_sampling_window",
    "next_processing_time",
    "retry_until_valid",
    "process_directory",
    "gzip_archives",
    "follow_capture",
    "process_capture_overlapped",
    "process_capture_sharded",
]


def process_capture_overlapped(
    capture_path: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig | None = None,
    remote: bool = False,
    foffset_hz: float = 0.0,
    batch_epochs: int = 50,
    out_mat: str | None = None,
    prefetch: int = 2,
    ingest_dtype: str | None = None,
    parity_ns: float | None = None,
) -> dict:
    """GoRanging semantics, end to end, with host IO overlapped with
    device compute.

    The reference overlaps its two channel pthreads with file reads via
    semaphores (``processing/CPP/main.cpp:180-187,487-497``).  The
    TPU-era layout:

    - a prefetch thread packs interleaved sc16 straight into the
      real-valued boundary layout (one pass, no complex intermediate),
    - BOTH channels of each batch run as one device program (the channel
      pair becomes the leading batch axis with a per-epoch fixed-df
      vector), so the per-batch relay cost is paid once,
    - samples ship half-precision (default) or int8-quantized on
      accelerators: the link is byte-rate bound end to end, so the
      transfer format is chosen by the ``parity_ns`` budget against the
      MEASURED delay-error table of each format (f16 p99 0.69 ps, int8
      p99 39.9 ps at the -13 dB operating point — PARITY.md deviation
      10; ``_resolve_ingest_dtype``),
    - each batch's nine outputs come back as ONE packed array (a single
      d2h fetch, ``ops/boundary.ranging_step_packed``), fetched while
      the next batch computes and the one after is being read — a
      two-deep software pipeline.

    Returns the GoRanging output dict plus a ``timing`` breakdown.
    """
    import queue
    import threading

    import jax.numpy as jnp
    import numpy as np

    from amaranth_twstft_tpu.models.godual import ChannelArrays, build_replica
    from amaranth_twstft_tpu.models.goranging import default_mat_name
    from amaranth_twstft_tpu.ops import boundary
    proc = proc or ProcessingConfig(hamming_window=True)
    t_all = time.time()
    rep = build_replica(code_path, signal, proc, conjugate=True)
    L = rep.samples_per_code
    n_chan = 1 if remote else 2

    accel = boundary.on_accelerator()
    # resolve the ingest dtype BEFORE the df pre-pass so
    # ingest_dtype="float32" restores full precision end to end (the
    # per-file df biases every epoch's correction); parity_ns is the
    # caller's delay-parity budget (see _resolve_ingest_dtype)
    in_dtype = np.dtype(_resolve_ingest_dtype(ingest_dtype, parity_ns, accel))

    # --- prefetch thread: disk -> packed (C, n, L, 2) batches ----------
    # (started BEFORE the df pre-pass: the first `prefetch` batches'
    # disk+convert hide behind the pre-pass h2d/FFT — the loop's first
    # dispatch then only waits on the link, not the host)
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    stats: dict = {"disk_s": 0.0, "convert_s": 0.0, "bytes_read": 0,
                   "h2d_call_s": 0.0, "dispatch_call_s": 0.0,
                   "fetch_s": 0.0, "bytes_shipped": 0, "n_batches": 0}

    def reader():
        # any reader failure must surface on the queue: a dead
        # reader with no sentinel hangs the consumer forever
        # (and, sharded, every other process at its next collective)
        try:
            start = 0
            while True:
                scale = None
                if n_chan == 2 and in_dtype == np.int8:
                    # int8 transfer mode: half the bytes of f16/sc16
                    d, n, scale = io.read_sc16_epochs_q8(
                        capture_path, start, batch_epochs, L, channels=2,
                        timers=stats,
                    )
                elif n_chan == 2 and in_dtype == np.int16:
                    # raw sc16 ship: zero host convert, device dequant
                    d, n = io.read_sc16_epochs_raw16(
                        capture_path, start, batch_epochs, L, channels=2,
                        timers=stats,
                    )
                elif n_chan == 2:
                    # single contiguous conversion, both channels in one
                    # buffer; the device deinterleaves (boundary layer)
                    d, n = io.read_sc16_epochs_packed(
                        capture_path, start, batch_epochs, L, channels=2,
                        dtype=in_dtype, timers=stats,
                    )
                elif in_dtype == np.int8:
                    # remote/single-channel int8: quantize just channel 1's
                    # columns (half the bytes of the f16 single-channel ship)
                    d, n, scale = io.read_sc16_epochs_q8(
                        capture_path, start, batch_epochs, L, channels=2,
                        timers=stats, select=0,
                    )
                    d = d[None]  # (1, n, L, 2) — the channel-major layout
                elif in_dtype == np.int16:
                    d, n = io.read_sc16_epochs_raw16(
                        capture_path, start, batch_epochs, L, channels=2,
                        timers=stats, select=0,
                    )
                    d = d[None]
                else:
                    d, n = io.read_sc16_epochs_ri(
                        capture_path, start, batch_epochs, L, channels=2,
                        dtype=in_dtype, timers=stats,
                        select=0 if n_chan == 1 else None,
                    )
                if n == 0:
                    break
                q.put((d, n, scale))
                start += n * L
                if n < batch_epochs:
                    break
        except BaseException as e:  # noqa: BLE001
            q.put(e)
            return
        q.put(None)

    th = threading.Thread(target=reader, daemon=True)
    th.start()

    # --- df pre-pass, overlapped with the reader thread filling its
    # prefetch window (shared helper, _prepass_df) ----------------------
    dfs, t_df = _prepass_df(
        capture_path, proc, signal, foffset_hz, in_dtype, accel, n_chan
    )

    t0 = time.time()
    step = boundary.make_ranging_step(
        np.asarray(rep.fcode), np.asarray(rep.code_interp),
        np.ones(L, bool), signal.fs, nint=proc.nint, packed=True,
    )
    df_full = np.repeat(
        np.asarray(dfs[:n_chan], np.float32), batch_epochs
    )  # (n_chan*B,) per-epoch fixed df
    dfv_dev = jnp.asarray(df_full)  # uploaded ONCE, reused per batch

    chans = [ChannelArrays() for _ in range(n_chan)]
    pending: list[tuple] = []  # (outs, n) not yet fetched

    def drain(entry):
        outs, n, b = entry  # b = padded batch rows per channel
        # ONE d2h fetch per batch (the sync point — on the relayed TPU
        # this wait also absorbs the program's execution time)
        tf = time.perf_counter()
        fetched = np.asarray(outs)
        stats["fetch_s"] += time.perf_counter() - tf
        res = boundary.to_epoch_result(boundary.unpack_outputs(fetched))
        for c in range(n_chan):
            sl = slice(c * b, c * b + n)
            sub = type(res)(
                **{
                    f: getattr(res, f)[sl]
                    for f in res.__dataclass_fields__
                }
            )
            chans[c].extend(sub, np.full((n,), dfs[c]))

    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item  # reader thread failed (see reader())
        d, n, scale = item
        stats["n_batches"] += 1
        if n_chan == 2:
            if n < batch_epochs:
                # zero-pad the final partial batch to the full shape: a
                # fresh shape would cost a fresh multi-minute compile
                # through the relay; padded rows are sliced off in drain
                d = np.concatenate(
                    [d[:n], np.zeros((batch_epochs - n,) + d.shape[1:],
                                     d.dtype)], axis=0,
                )
            b = batch_epochs
            th2 = time.perf_counter()
            iq = jnp.asarray(d)  # (B, L, 4): device deinterleaves
            stats["h2d_call_s"] += time.perf_counter() - th2
            stats["bytes_shipped"] += d.nbytes
            dfv = dfv_dev
        else:
            # remote/single-channel: pad the final partial batch like
            # the dual-channel branch — a fresh (n, L, 2) shape would
            # cost a fresh multi-minute compile through the relay
            d = d[:n_chan]  # the f32 reader returns both channels
            if n < batch_epochs:
                d = np.concatenate(
                    [d[:, :n],
                     np.zeros((n_chan, batch_epochs - n, L, 2), d.dtype)],
                    axis=1,
                )
            b = batch_epochs
            th2 = time.perf_counter()
            iq = jnp.asarray(
                d[:n_chan, :batch_epochs].reshape(n_chan * batch_epochs, L, 2)
            )
            stats["h2d_call_s"] += time.perf_counter() - th2
            stats["bytes_shipped"] += (
                n_chan * batch_epochs * L * 2 * d.dtype.itemsize
            )
            dfv = dfv_dev
        td = time.perf_counter()
        outs = step(iq, df_fixed=dfv, scale=scale)  # async dispatch
        stats["dispatch_call_s"] += time.perf_counter() - td
        pending.append((outs, n, b))
        if len(pending) > 1:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    th.join()
    t_loop = time.time() - t0

    out = {
        "ch1": chans[0].asdict(),
        "ch2": chans[1].asdict() if n_chan == 2 else None,
        "df": dfs,
    }
    t0 = time.time()
    out_mat = out_mat or default_mat_name(capture_path, remote)
    matio.save_c_style(out_mat, out["ch1"], out["ch2"])
    out["mat_path"] = out_mat
    stats["loop_effective_mbps"] = (
        stats["bytes_shipped"] / t_loop / 1e6 if t_loop > 0 else 0.0
    )
    out["timing"] = {
        "df_prepass_s": t_df,
        "epoch_loop_s": t_loop,
        "mat_write_s": time.time() - t0,
        "total_s": time.time() - t_all,
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in stats.items()},
    }
    return out


def process_capture_sharded(
    capture_path: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig | None = None,
    mesh=None,
    remote: bool = False,
    foffset_hz: float = 0.0,
    batch_epochs: int = 25,
    out_mat: str | None = None,
    prefetch: int = 2,
    ingest_dtype: str | None = None,
    parity_ns: float | None = None,
    axis: str | None = None,
) -> dict | None:
    """GoRanging end to end over a DEVICE MESH — the multi-chip pipeline.

    Layout (SURVEY.md §2.6 composed with the epoch streaming of
    ``processing/CPP/main.cpp:452-519``): GoRanging epochs are disjoint
    and independent (fixed per-file df, no ``dold`` carry), so the
    capture's epoch axis is pure data parallelism — each device runs the
    complete per-epoch chain on its ``batch_epochs`` slice of every
    global batch via ``shard_map``, with NO collectives inside the step;
    the only cross-device traffic is the per-host ingest sharding in and
    the tiny packed-outputs gather out.

    Multi-host: every process reads ONLY its own slice of the capture
    (its local devices' epochs; ``jax.make_array_from_process_local_data``
    assembles the global batch without any host holding the whole
    stream), and process 0 alone writes the ``.mat``.  This is the
    jax.distributed replacement for the reference's scp/rsync record
    shipping (``experiments/221219_twoway/README.md:4-10``).

    Numerics are identical to :func:`process_capture_overlapped` at any
    device count (asserted by ``tests/test_sharded.py``): the per-epoch
    programs are the same; only the batch partitioning changes.

    Returns the GoRanging output dict + ``timing`` on process 0, and
    ``None`` on other processes.
    """
    import queue
    import threading

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amaranth_twstft_tpu.models.godual import ChannelArrays, build_replica
    from amaranth_twstft_tpu.models.goranging import default_mat_name
    from amaranth_twstft_tpu.ops import boundary
    from amaranth_twstft_tpu.parallel.mesh import make_mesh

    proc = proc or ProcessingConfig(hamming_window=True)
    t_all = time.time()
    if mesh is None:
        mesh = make_mesh(n_time=len(jax.devices()), n_channel=1)
    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_proc = jax.process_count()
    pid = jax.process_index()
    is_root = pid == 0
    B_glob = batch_epochs * n_dev  # epochs per global batch
    if B_glob % n_proc:
        raise ValueError(
            f"global batch {B_glob} not divisible by {n_proc} processes"
        )
    B_proc = B_glob // n_proc  # epochs this process ingests per batch

    rep = build_replica(code_path, signal, proc, conjugate=True)
    L = rep.samples_per_code
    n_chan = 1 if remote else 2

    accel = boundary.on_accelerator()
    in_dtype = np.dtype(_resolve_ingest_dtype(ingest_dtype, parity_ns, accel))

    total_avail = io.n_samples_sc16(capture_path, channels=2) // L

    stats: dict = {"disk_s": 0.0, "convert_s": 0.0, "bytes_read": 0}
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def reader():
        # a dead reader with no sentinel hangs the consumer forever —
        # and every OTHER process at its next collective (see the
        # overlapped pipeline's reader)
        try:
            start_epoch = 0
            while start_epoch < total_avail:
                n_glob = min(B_glob, total_avail - start_epoch)
                # this process's contiguous slice of the global batch
                lo = start_epoch + min(pid * B_proc, n_glob)
                hi = start_epoch + min((pid + 1) * B_proc, n_glob)
                scale = 1.0
                if hi <= lo:
                    d, n_loc = np.zeros((0, L, 4), in_dtype), 0
                elif in_dtype == np.int8:
                    d, n_loc, scale = io.read_sc16_epochs_q8(
                        capture_path, lo * L, hi - lo, L, channels=2,
                        timers=stats,
                    )
                elif in_dtype == np.int16:
                    d, n_loc = io.read_sc16_epochs_raw16(
                        capture_path, lo * L, hi - lo, L, channels=2,
                        timers=stats,
                    )
                else:
                    d, n_loc = io.read_sc16_epochs_packed(
                        capture_path, lo * L, hi - lo, L, channels=2,
                        dtype=in_dtype, timers=stats,
                    )
                if n_loc < B_proc:
                    # zero-pad to the full local shape (fresh shapes
                    # would recompile); padded rows dropped on the host
                    d = np.concatenate(
                        [d[:n_loc],
                         np.zeros((B_proc - n_loc,) + (L, 2 * 2),
                                  in_dtype)],
                        axis=0,
                    )
                q.put((d, n_glob, scale))
                start_epoch += n_glob
        except BaseException as e:  # noqa: BLE001
            q.put(e)
            return
        q.put(None)

    # reader starts BEFORE the df pre-pass so its first prefetch window
    # of disk+convert hides behind the pre-pass (same overlap as
    # process_capture_overlapped)
    th = threading.Thread(target=reader, daemon=True)
    th.start()

    # --- df pre-pass (replicated; every process reads the bounded
    # prefix of its own capture copy or the shared file — shared
    # helper, numerics identical to process_capture_overlapped) --------
    dfs, t_df = _prepass_df(
        capture_path, proc, signal, foffset_hz, in_dtype, accel, n_chan
    )

    # --- the sharded per-batch program --------------------------------
    step_local = boundary.make_ranging_step(
        np.asarray(rep.fcode), np.asarray(rep.code_interp),
        np.ones(L, bool), signal.fs, nint=proc.nint, packed=True,
    )
    # per-device df vector (same on every shard); the program always
    # computes both interleaved channels — in remote mode channel 2 is
    # dropped on the host, its df slot is a harmless duplicate
    df_pair = (dfs + dfs[:1])[:2]
    df_local = np.repeat(np.asarray(df_pair, np.float32), batch_epochs)

    def local_fn(iq_l, dfv_l, scale_l):
        # iq_l: (batch_epochs, L, 2*n_chan) on EACH device; scale_l is
        # that device's (1,) int8 dequantization scale — sharded, not
        # replicated, because each PROCESS quantizes its own ingest
        # slice with its own per-batch scale
        return step_local(iq_l, df_fixed=dfv_l, scale=scale_l[0])

    sharded_step = jax.jit(jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(), P(axis)),
        out_specs=P(axis, None),
        check_vma=False,
    ))
    in_sharding = NamedSharding(mesh, P(axis, None, None))
    dfv = jnp.asarray(df_local)

    t0 = time.time()
    chans = [ChannelArrays() for _ in range(n_chan)]
    pending: list[tuple] = []

    def fetch_global(outs) -> np.ndarray:
        if n_proc == 1:
            return np.asarray(outs)
        # fetch this process's addressable shards in global row order,
        # then allgather across processes (process order == global
        # device order for the standard mesh layout)
        from jax.experimental import multihost_utils

        shards = sorted(
            outs.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        g = multihost_utils.process_allgather(local)
        return np.asarray(g).reshape(-1, local.shape[-1])

    def drain(entry):
        outs, n_glob = entry
        a = fetch_global(outs)  # (n_dev*2*batch_epochs, 14)
        # device blocks are [ch1 rows (B), ch2 rows (B)] each; reorder
        # to channel-major global epoch order, then trim padding and
        # (in remote mode) the unused second channel
        a = a.reshape(n_dev, 2, batch_epochs, a.shape[-1])
        a = a.transpose(1, 0, 2, 3).reshape(
            2, n_dev * batch_epochs, a.shape[-1]
        )[:n_chan, :n_glob]
        res = boundary.to_epoch_result(boundary.unpack_outputs(a))
        for c in range(n_chan):
            sub = type(res)(
                **{
                    f: getattr(res, f)[c]
                    for f in res.__dataclass_fields__
                }
            )
            chans[c].extend(sub, np.full((n_glob,), dfs[c]))

    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item  # reader thread failed (see reader())
        d, n_glob, scale = item
        scale_loc = np.full(n_dev // n_proc, scale, np.float32)
        if n_proc == 1:
            iq = jax.device_put(d, in_sharding)
            sc = jax.device_put(scale_loc, NamedSharding(mesh, P(axis)))
        else:
            iq = jax.make_array_from_process_local_data(in_sharding, d)
            sc = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(axis)), scale_loc
            )
        outs = sharded_step(iq, dfv, sc)
        pending.append((outs, n_glob))
        if len(pending) > 1:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    th.join()
    t_loop = time.time() - t0

    if not is_root:
        return None
    out = {
        "ch1": chans[0].asdict(),
        "ch2": chans[1].asdict() if n_chan == 2 else None,
        "df": dfs,
    }
    t0 = time.time()
    out_mat = out_mat or default_mat_name(capture_path, remote)
    matio.save_c_style(out_mat, out["ch1"], out["ch2"])
    out["mat_path"] = out_mat
    out["timing"] = {
        "df_prepass_s": t_df,
        "epoch_loop_s": t_loop,
        "mat_write_s": time.time() - t0,
        "total_s": time.time() - t_all,
        "n_devices": n_dev,
        "n_processes": n_proc,
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in stats.items()},
    }
    return out


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
        if i == attempts - 1:
            break  # no attempt follows: skip the reset + delay
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
