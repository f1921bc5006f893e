"""The production C++ batch chain (``processing/CPP/main.cpp`` "GoRanging").

Differences from the archived Octave chain (``models/godual``), each a
documented reference behavior:

- **fixed per-file df**: one decimate-by-25 pre-pass over the whole file
  fixes df1/df2 for every epoch (``main.cpp:363-450``; the "C++ differs by
  tens of ps" note of ``experiments/221219_twoway/README.md:60-62`` traces
  to exactly this),
- channel 2's pre-pass argmax searches the *whole* decimated spectrum, not
  the +/-2*frange window (``main.cpp:442`` quirk, preserved),
- the code spectrum is Hamming-windowed in natural order
  (``main.cpp:717-719``),
- output field convention: ``correction1`` = indice + correction combined,
  ``SNR1`` in dB, complex ``xval*`` neighbors; output name ``<stem>C.mat``
  with ``remote`` prefix when remote (``main.cpp:540-651,786-798``).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig
from amaranth_twstft_tpu.models.godual import ChannelArrays, build_replica
from amaranth_twstft_tpu.ops.correlator import correlate_epochs
from amaranth_twstft_tpu.ops.doppler import per_file_df
from amaranth_twstft_tpu.utils import io, matio

__all__ = ["process_file", "default_mat_name"]


def default_mat_name(capture_path: str, remote: bool) -> str:
    """``data.bin -> dataC.mat`` (+ ``remote`` prefix), ``main.cpp:786-798``."""
    d = os.path.dirname(capture_path) or "."
    stem = os.path.basename(capture_path)
    if stem.endswith(".bin"):
        stem = stem[: -len(".bin")]
    prefix = "remote" if remote else ""
    return os.path.join(d, prefix + stem + "C.mat")


def process_file(
    capture_path: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig | None = None,
    remote: bool = False,
    foffset_hz: float = 0.0,
    batch_epochs: int = 25,
    out_mat: str | None = None,
    dtype=jnp.complex64,
) -> dict:
    """Run the GoRanging chain over one capture file."""
    import dataclasses

    proc = proc or ProcessingConfig(hamming_window=True)
    if not proc.hamming_window:
        proc = dataclasses.replace(proc, hamming_window=True)
    rep = build_replica(code_path, signal, proc, conjugate=True, dtype=dtype)
    L = rep.samples_per_code

    # --- per-file df pre-pass (decimated squaring FFT) -----------------
    from amaranth_twstft_tpu.ops import boundary
    from amaranth_twstft_tpu.ops.doppler import (
        bound_prepass_window,
        per_file_df_ri,
    )

    accel = boundary.on_accelerator()
    np_dtype = np.complex64 if dtype == jnp.complex64 else np.complex128
    dec = io.decimate_sc16(capture_path, proc.df_decimation, channels=2, dtype=np_dtype)
    dec = bound_prepass_window(dec)

    def _pfd(x, windowed):
        if accel:
            return per_file_df_ri(
                jnp.asarray(boundary.pack_complex(x)), signal.fs,
                proc.df_decimation, foffset_hz=foffset_hz, windowed=windowed,
            )
        return per_file_df(
            jnp.asarray(x), signal.fs, proc.df_decimation,
            foffset_hz=foffset_hz, windowed=windowed,
        )

    dfs = [float(_pfd(dec[0], True))]
    if not remote:
        # main.cpp:442 searches the whole spectrum for channel 2
        dfs.append(float(_pfd(dec[1], False)))

    # --- epoch loop with fixed df --------------------------------------
    n_chan = 1 if remote else 2
    chans = [ChannelArrays() for _ in range(n_chan)]
    if accel:
        step = boundary.make_ranging_step(
            np.asarray(rep.fcode), np.asarray(rep.code_interp),
            np.ones(L, bool), signal.fs, nint=proc.nint,
        )
    start = 0
    while True:
        d, n = io.read_sc16_epochs(
            capture_path, start, batch_epochs, L, channels=2, dtype=np_dtype
        )
        if n == 0:
            break
        start += n * L
        for c in range(n_chan):
            if accel:
                outs = step(
                    jnp.asarray(boundary.pack_complex(d[c, :n])),
                    df_fixed=dfs[c],
                )
                res = boundary.to_epoch_result(outs)
                df_vec = np.full((n,), dfs[c])
            else:
                dc = jnp.asarray(d[c, :n])
                df_vec = jnp.full((n,), dfs[c], dtype=rep.code_interp.dtype)
                res = correlate_epochs(
                    dc, rep.fcode, df_vec, rep.code_interp, signal.fs,
                    nint=proc.nint, fcode_interp=rep.fcode_interp,
                )
            chans[c].extend(res, df_vec)
        if n < batch_epochs:
            break

    out = {
        "ch1": chans[0].asdict(),
        "ch2": chans[1].asdict() if n_chan == 2 else None,
        "df": dfs,
    }
    out_mat = out_mat or default_mat_name(capture_path, remote)
    matio.save_c_style(out_mat, out["ch1"], out["ch2"])
    out["mat_path"] = out_mat
    return out
