"""The archived dual-channel ranging chain (Octave ``godual_ranging.m``).

File-level behavior (``processing/Octave/godual_ranging.m:57-133``):

- the PRN code file is chosen by station parity: LTFB=odd, OP=even
  (``godual_ranging.m:60-61``),
- the capture is consumed one code period at a time; a short final read
  ends the loop (``godual_ranging.m:75-102``),
- channel 1 (measurement) and channel 2 (loopback reference) are both
  processed when local; only channel 1 when remote (``godual_ranging.m:79-99``),
- the df search window is +/-20 kHz local; for remote it is 80..120 kHz
  with OP-dependent sign (``godual_ranging.m:83-90``),
- outputs are saved as ``.mat`` with the Octave field convention; remote
  outputs are prefixed ``remote`` (``godual_ranging.m:126-131``).

TPU-first: epochs are processed in large batches (one dense (B, L) FFT
feeds the chip; the reference does one 2e5-point FFT at a time per pthread,
``processing/CPP/main.cpp:224-241``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig, StationConfig
from amaranth_twstft_tpu.ops import doppler
from amaranth_twstft_tpu.ops.correlator import EpochResult, correlate_epochs
from amaranth_twstft_tpu.ops.doppler import squaring_df, window_mask
from amaranth_twstft_tpu.ops.lfsr import read_prn_file
from amaranth_twstft_tpu.ops.prn import (
    chips_to_pm1,
    code_spectrum,
    interp_code,
    upsample_zoh,
)
from amaranth_twstft_tpu.utils import io, matio

__all__ = ["Replica", "build_replica", "df_window", "ChannelArrays", "process_file"]


@dataclass(frozen=True)
class Replica:
    """Everything derived from the PRN code file.

    Host-resident (NumPy): complex arrays must not cross the device
    boundary eagerly on the axon TPU (``ops/boundary.py``); the jitted
    kernels convert on entry, and the accelerated paths re-pack as
    re/im pairs.
    """

    code: np.ndarray  # +/-1 at fs (L,)
    fcode: np.ndarray  # replica spectrum (conjugated unless claudio)
    code_interp: np.ndarray  # +/-1 on the (2*nint+1) grid
    fcode_interp: np.ndarray  # conj FFT of code_interp (SNR identity)
    samples_per_code: int


def build_replica(
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig,
    conjugate: bool = True,
    dtype=jnp.complex64,
) -> Replica:
    """Code file -> x2 ZOH -> +/-1 -> (conj) FFT [-> Hamming]
    (``godual_ranging.m:63-66``, ``main.cpp:658-732``)."""
    chips = read_prn_file(code_path)
    code = chips_to_pm1(upsample_zoh(chips, signal.samples_per_chip))
    fcode = code_spectrum(
        code, conj=conjugate, hamming_window=proc.hamming_window
    ).astype(np.complex64 if dtype == jnp.complex64 else np.complex128)
    real_dtype = np.float32 if dtype == jnp.complex64 else np.float64
    code3_np = interp_code(code, proc.interp_factor)
    code3 = code3_np.astype(real_dtype)
    np_c = np.complex64 if dtype == jnp.complex64 else np.complex128
    fcode3 = np.conj(np.fft.fft(code3_np)).astype(np_c)
    return Replica(
        code=code,
        fcode=fcode,
        code_interp=code3,
        fcode_interp=fcode3,
        samples_per_code=len(code),
    )


def df_window(station: StationConfig, remote: bool) -> tuple[float, float]:
    """The squaring-FFT search window (on the doubled-frequency axis).

    Local: +/-20 kHz; remote: (-120,-80) kHz at OP, (80,120) kHz at LTFB
    (``godual_ranging.m:83-90``).
    """
    if not remote:
        return (-20e3, 20e3)
    if station.op:
        return (-120e3, -80e3)
    return (80e3, 120e3)


@dataclass
class ChannelArrays:
    """Accumulated per-epoch arrays for one channel (host side)."""

    indice: list = field(default_factory=list)
    correction: list = field(default_factory=list)
    snr_r: list = field(default_factory=list)
    snr_i: list = field(default_factory=list)
    df: list = field(default_factory=list)
    puissance: list = field(default_factory=list)
    puissance_code: list = field(default_factory=list)
    puissance_noise: list = field(default_factory=list)
    xval: list = field(default_factory=list)
    xvalm1: list = field(default_factory=list)
    xvalp1: list = field(default_factory=list)

    def extend(self, res: EpochResult, df) -> None:
        self.indice.append(np.asarray(res.indice))
        self.correction.append(np.asarray(res.correction))
        self.snr_r.append(np.asarray(res.snr_r))
        self.snr_i.append(np.asarray(res.snr_i))
        self.df.append(np.broadcast_to(np.asarray(df), np.asarray(res.indice).shape))
        self.puissance.append(np.asarray(res.puissance))
        self.puissance_code.append(np.asarray(res.puissance_code))
        self.puissance_noise.append(np.asarray(res.puissance_noise))
        self.xval.append(np.asarray(res.xval))
        self.xvalm1.append(np.asarray(res.xvalm1))
        self.xvalp1.append(np.asarray(res.xvalp1))

    def asdict(self) -> dict:
        return {
            k: np.concatenate(getattr(self, k)) if getattr(self, k) else np.array([])
            for k in (
                "indice",
                "correction",
                "snr_r",
                "snr_i",
                "df",
                "puissance",
                "puissance_code",
                "puissance_noise",
                "xval",
                "xvalm1",
                "xvalp1",
            )
        }


def process_file(
    capture_path: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig,
    station: StationConfig | None = None,
    remote: bool = False,
    batch_epochs: int = 25,
    out_mat: str | None = None,
    dtype=jnp.complex64,
    verbose: bool = False,
    df_window_hz: tuple[float, float] | None = None,
) -> dict:
    """Run the godual chain over one capture file.

    Returns ``{"ch1": arrays, "ch2": arrays | None}`` and optionally writes
    the Octave-convention ``.mat`` (remote outputs prefixed ``remote``,
    ``godual_ranging.m:126-131``).  ``df_window_hz`` overrides the
    production station/remote window presets of :func:`df_window`.
    """
    station = station or StationConfig()
    rep = build_replica(code_path, signal, proc, conjugate=True, dtype=dtype)
    L = rep.samples_per_code
    lo_hz, hi_hz = df_window_hz or df_window(station, remote)
    mask = window_mask(L, signal.fs, lo_hz, hi_hz)

    n_chan = 1 if remote else 2
    chans = [ChannelArrays() for _ in range(n_chan)]

    # On an accelerator, run through the real-valued boundary layer (one
    # fused fast-path program; complex buffers cannot cross the axon TPU
    # program boundary).  The CPU path keeps exact float64-capable kernels.
    from amaranth_twstft_tpu.ops import boundary

    accel = boundary.on_accelerator()
    if accel:
        step = boundary.make_ranging_step(
            np.asarray(rep.fcode), np.asarray(rep.code_interp), mask,
            signal.fs, nint=proc.nint, fine_freq=proc.fine_freq,
        )

    start = 0
    while True:
        d, n = io.read_sc16_epochs(
            capture_path,
            start,
            batch_epochs,
            L,
            channels=2,
            dtype=np.complex64 if dtype == jnp.complex64 else np.complex128,
        )
        if n == 0:
            break
        start += n * L
        for c in range(n_chan):
            if accel:
                outs = step(jnp.asarray(boundary.pack_complex(d[c, :n])))
                df = np.asarray(outs.df)
                res = boundary.to_epoch_result(outs)
            else:
                dc = jnp.asarray(d[c, :n])
                df, _ = squaring_df(dc, signal.fs, mask)
                if proc.fine_freq:
                    # pyFFTW-chain refinement: mix by the coarse df, fit
                    # the residual phase drift, and correlate at the
                    # refined frequency (godual_ranging_fftw.py:35-39)
                    t = jnp.arange(L, dtype=jnp.float64) / signal.fs
                    y = dc * jnp.exp(-2j * jnp.pi * df[:, None] * t)
                    df = df + doppler.fine_df_phase_drift(y, signal.fs)
                res = correlate_epochs(
                    dc,
                    rep.fcode,
                    df.astype(rep.code_interp.dtype),
                    rep.code_interp,
                    signal.fs,
                    nint=proc.nint,
                    fcode_interp=rep.fcode_interp,
                )
            chans[c].extend(res, df)
            if verbose:
                delays = (
                    (np.asarray(res.indice) + np.asarray(res.correction))
                    / signal.fs
                    / proc.interp_factor
                )
                for i in range(n):
                    print(
                        f"{len(chans[c].indice)}\t{delays[i]:.12f}\t"
                        f"{float(np.asarray(df)[i]):.3f}\t"
                        f"{10*np.log10(float(np.asarray(res.puissance)[i])):.1f}\t"
                        f"{float(np.asarray(res.snr_db)[i]):.1f}"
                    )
        if n < batch_epochs:
            break

    out = {"ch1": chans[0].asdict(), "ch2": chans[1].asdict() if n_chan == 2 else None}
    if out_mat is None and capture_path.endswith(".bin"):
        base = os.path.basename(capture_path).replace(".bin", ".mat")
        prefix = "remote" if remote else ""
        out_mat = os.path.join(os.path.dirname(capture_path) or ".", prefix + base)
    if out_mat:
        matio.save_octave_style(out_mat, out["ch1"], out["ch2"], rep.code)
        out["mat_path"] = out_mat
    return out
