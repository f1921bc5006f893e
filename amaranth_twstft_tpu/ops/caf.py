"""Dense cross-ambiguity function (delay x Doppler) search.

The DLL/PLL receiver acquires by scanning Doppler hierarchically — per
frequency: downconvert, FFT, cross-spectrum, IFFT, peak, halving the step
until < 1 Hz (``experiments/231001_DLL_PLL/rxcomplex.cpp:530-568``).  That
is a data-dependent loop of small FFTs — exactly what TPUs dislike.

TPU-first redesign (SURVEY.md §7.2 step 4):

- FFT the data **once**; a Doppler shift of ``k`` spectrum bins is a
  circular roll of the data spectrum (exact when the hypothesis grid is
  integer-bin, e.g. 100 Hz steps on a 25 Hz bin grid),
- evaluate the whole dense grid as batched rolls x conj-code products x
  batched IFFTs, keeping only per-hypothesis peak (power, index),
- refine: parabolic interpolation across the Doppler axis and one true
  mixed correlation at the refined frequency for the sub-sample delay
  (the reference's own 3-point parabola, ``godual_ranging.m:29-33``).

The hypothesis axis is the natural ``channel``-mesh sharding axis — see
:mod:`amaranth_twstft_tpu.parallel.sharded`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from amaranth_twstft_tpu.ops.correlator import correlate_epochs, EpochResult

__all__ = ["CafPeaks", "doppler_bins", "caf_peaks", "caf_search", "caf_surface"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CafPeaks:
    """Per-(epoch, hypothesis) peak summaries of the CAF."""

    power: jax.Array  # (..., H) peak |corr|^2
    index: jax.Array  # (..., H) int32 delay index (non-interpolated grid)


def doppler_bins(fs: float, n: int, doppler_min: float, doppler_max: float,
                 step: float):
    """Integer-bin Doppler grid covering [doppler_min, doppler_max].

    Returns (shifts, freqs): spectrum-roll counts and their exact
    frequencies (bin = fs/n).  The requested step is rounded to the nearest
    nonzero bin multiple.
    """
    import numpy as np

    bin_hz = fs / n
    step_bins = max(1, int(round(step / bin_hz)))
    lo = int(round(doppler_min / bin_hz))
    hi = int(round(doppler_max / bin_hz))
    shifts_np = np.arange(lo, hi + 1, step_bins, dtype=np.int32)
    return jnp.asarray(shifts_np), shifts_np.astype(np.float64) * bin_hz


@partial(jax.jit, static_argnames=("chunk",))
def caf_peaks(
    d: jax.Array,
    fcode: jax.Array,
    shifts: jax.Array,
    chunk: int = 8,
) -> CafPeaks:
    """Peak (power, index) for every Doppler hypothesis.

    ``d``: (B, L) epochs; ``shifts``: (H,) integer spectrum rolls.  Scans
    the hypothesis axis in chunks so only (chunk, B, L) correlation maps
    are ever materialized (a full (B, H, L) surface would be GBs).
    Mixing by ``exp(-2j pi (kـshift) f t)`` equals rolling the data
    spectrum by ``-shift``; roll direction matches ``fft(d * lo)`` with
    ``lo = exp(-2j pi f_shift t)``.
    """
    d = d - jnp.mean(d, axis=-1, keepdims=True)
    D = jnp.fft.fft(d, axis=-1)  # (B, L), computed once
    H = shifts.shape[0]
    pad = (-H) % chunk
    shifts_p = jnp.concatenate([shifts, jnp.zeros((pad,), shifts.dtype)])

    def one_chunk(sh):  # sh: (chunk,)
        def one(s):
            prod = jnp.roll(D, -s, axis=-1) * fcode
            corr = jnp.fft.ifft(prod, axis=-1)
            p = jnp.abs(corr) ** 2
            idx = jnp.argmax(p, axis=-1).astype(jnp.int32)
            pk = jnp.max(p, axis=-1)
            return pk, idx

        return jax.vmap(one)(sh)  # (chunk, B)

    pks, idxs = jax.lax.map(one_chunk, shifts_p.reshape(-1, chunk))
    pks = pks.reshape(-1, *d.shape[:-1])[: H]
    idxs = idxs.reshape(-1, *d.shape[:-1])[: H]
    # (H, B) -> (B, H)
    perm = tuple(range(1, pks.ndim)) + (0,)
    return CafPeaks(power=jnp.transpose(pks, perm), index=jnp.transpose(idxs, perm))


@dataclass(frozen=True)
class CafResult:
    """Refined CAF estimate per epoch."""

    df_hz: jax.Array  # refined Doppler
    df_coarse_hz: jax.Array  # best grid hypothesis
    epoch: EpochResult  # full correlator output at the refined df


def caf_search(
    d: jax.Array,
    fcode: jax.Array,
    code_interp: jax.Array,
    fs: float,
    doppler_min: float,
    doppler_max: float,
    step: float,
    *,
    nint: int = 1,
    refine: bool = True,
    chunk: int = 8,
) -> CafResult:
    """Full dense CAF acquisition: grid peaks -> Doppler parabola ->
    interpolated delay at the refined frequency."""
    L = d.shape[-1]
    shifts, freqs = doppler_bins(fs, L, doppler_min, doppler_max, step)
    peaks = caf_peaks(d, fcode, shifts, chunk=chunk)
    h_best = jnp.argmax(peaks.power, axis=-1)  # (B,)
    bin_hz = fs / L
    step_hz = float(freqs[1] - freqs[0]) if freqs.shape[0] > 1 else bin_hz
    f_best = jnp.take(jnp.asarray(freqs), h_best)
    if refine and freqs.shape[0] > 2:
        H = peaks.power.shape[-1]
        hm1 = jnp.clip(h_best - 1, 0, H - 1)
        hp1 = jnp.clip(h_best + 1, 0, H - 1)
        am1 = jnp.sqrt(jnp.take_along_axis(peaks.power, hm1[..., None], -1)[..., 0])
        ap1 = jnp.sqrt(jnp.take_along_axis(peaks.power, hp1[..., None], -1)[..., 0])
        # The correlation-peak amplitude vs Doppler offset follows
        # |sinc(pi * delta * T)| (coherent integration over one code, null
        # spacing 1/T = one spectrum bin).  For that profile the exact
        # 2-point interpolator is delta = step * (a+ - a-)/(a+ + a-)
        # — a 3-point parabola is badly biased near the nulls.
        den = ap1 + am1
        safe = jnp.where(den == 0, 1.0, den)
        delta = jnp.where(den == 0, 0.0, (ap1 - am1) / safe)
        interior = (h_best > 0) & (h_best < H - 1)
        df = f_best + jnp.where(interior, delta * step_hz, 0.0)
    else:
        df = f_best
    res = correlate_epochs(
        d,
        fcode,
        df.astype(jnp.float32 if d.dtype == jnp.complex64 else jnp.float64),
        code_interp,
        fs,
        nint=nint,
    )
    return CafResult(df_hz=df, df_coarse_hz=f_best, epoch=res)


def caf_surface(
    d: jax.Array, fcode: jax.Array, shifts: jax.Array
) -> jax.Array:
    """Full |CAF| surface (B, H, L) — diagnostics/plots only (large!)."""
    d = d - jnp.mean(d, axis=-1, keepdims=True)
    D = jnp.fft.fft(d, axis=-1)

    def one(s):
        return jnp.abs(jnp.fft.ifft(jnp.roll(D, -s, axis=-1) * fcode, axis=-1))

    surf = jax.vmap(one)(shifts)  # (H, B, L)
    return jnp.moveaxis(surf, 0, -2)
