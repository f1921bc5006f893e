"""The batched FFT correlator — the heart of the framework.

One jit-able function reproduces the per-epoch ``processing()`` of every
reference chain (SURVEY.md §7.1: the five divergent implementations
collapse into one kernel set with config switches):

    mix by exp(-2j*pi*df*t)  ->  FFT  ->  x (conj) code spectrum
    ->  3x zero-pad IFFT  ->  |.| argmax + parabolic correction
    ->  code-aligned SNR and powers

Behavioral spec: ``processing/Octave/godual_ranging.m:12-49`` (per-epoch),
``processing/CPP/main.cpp:224-361`` (same, fixed per-file df, threaded),
``acquisition/claudio_aligned_code_ranging_separate.m:49-102`` (conjugated
data + per-code windows, see :mod:`amaranth_twstft_tpu.models.claudio`).

TPU-first design: everything is batched over a leading ``epoch`` axis
(dense (B, L) FFTs feed the MXU/VPU far better than the reference's one-
epoch-at-a-time loops + pthreads, ``main.cpp:180-187``), shapes are static,
and there is no data-dependent control flow — slip handling is done by the
callers as masked re-computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.ops.fftutils import mix_phasor, spectral_zoom
from amaranth_twstft_tpu.ops.peaks import (
    parabolic_correction,
    peak_neighbors,
    take_circular,
)
from amaranth_twstft_tpu.ops.zoomdft import fine_window, zoom_point

__all__ = [
    "EpochResult",
    "correlate_epochs",
    "delay_seconds",
    "quick_xcorr_snr",
    "DEFAULT_FINE_WIDTH",
]

# Fine-interpolation window width of the fast path: +/-16 interpolated
# samples = +/-5 un-interpolated samples around the coarse peak.  The
# band-limited interpolation of a correlation peak never places the true
# fine maximum further than +/-(nint) fine samples from the coarse
# maximum unless two peaks are within noise of each other (in which case
# the estimate is meaningless either way).
DEFAULT_FINE_WIDTH = 32


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EpochResult:
    """Per-epoch outputs, field-for-field the reference's saved arrays.

    ``indice`` is **0-based** (the reference's 1-based Octave ``indice``
    equals ``indice + 1``; its printed delay ``(indice-1+correction)/fs/3``
    equals :func:`delay_seconds` here).  ``xval*`` are the complex peak and
    neighbors (``main.cpp:312-314``), kept for the carrier-phase refinement
    of the two-way solver.
    """

    indice: jax.Array  # int32, 0-based argmax on the interpolated grid
    correction: jax.Array  # parabolic sub-sample offset
    xval: jax.Array  # complex peak value
    xvalm1: jax.Array
    xvalp1: jax.Array
    snr_r: jax.Array  # mean(Re yincode)^2 / var(yincode)
    snr_i: jax.Array
    puissance: jax.Array  # var(y) — mixed-signal power (godual_ranging.m:46)
    puissance_code: jax.Array  # |mean(yincode)|^2 (godual_ranging.m:47)
    puissance_noise: jax.Array  # var(yincode) (godual_ranging.m:48)

    @property
    def snr_db(self):
        return 10.0 * jnp.log10(self.snr_r + self.snr_i)


def delay_seconds(res: EpochResult, fs: float, interp_factor: int):
    """Delay estimate in seconds: ``(indice + correction) / fs / (2*Nint+1)``
    (``godual_ranging.m:96`` with 0-based indice)."""
    return (res.indice + res.correction) / fs / interp_factor


@partial(
    jax.jit,
    static_argnames=(
        "nint",
        "conjugate_data",
        "compute_snr",
        "remove_mean",
        "fast",
        "mxu_fft",
    ),
)
def correlate_epochs(
    d: jax.Array,
    fcode: jax.Array,
    df_hz: jax.Array,
    code_interp: jax.Array,
    fs: float,
    *,
    nint: int = 1,
    conjugate_data: bool = False,
    compute_snr: bool = True,
    remove_mean: bool = True,
    fcode_interp: jax.Array | None = None,
    fast: bool = False,
    fine_matrix_ri: jax.Array | None = None,
    mxu_fft: bool = False,
) -> EpochResult:
    """Correlate a batch of epochs against the code spectrum.

    Args:
      d: (..., L) complex IQ, one code period per row.
      fcode: (L,) replica spectrum from :func:`ops.prn.code_spectrum`
        (conjugated for the godual convention, plain for claudio).
      df_hz: (...,) per-epoch frequency offsets (broadcast ok).
      code_interp: ((2*nint+1)*L,) +/-1 replica on the interpolated grid
        (only used when ``compute_snr``).
      fs: sample rate.
      conjugate_data: claudio convention ``fcode * conj(ffty)``
        (``claudio_...separate.m:59``) instead of godual's
        ``ffty * (already conjugated) fcode`` (``godual_ranging.m:25-26``).
      fast: interpolate only a window around the coarse (un-zoomed)
        correlation peak instead of IFFT-ing the full zero-padded
        spectrum: 3x less FFT work and the interpolation rides the MXU
        (:func:`ops.zoomdft.fine_window`).  Window samples are exact;
        the argmax is restricted to the window (identical results unless
        two correlation peaks tie within noise).
      fine_matrix_ri: static (L, W, 2) re/im matrix from
        :func:`ops.zoomdft.fine_window_matrix` for the fast path (built
        on the fly if omitted — prefer binding it once, it is ~L*W*8 B).
      mxu_fft: run the transforms as MXU matmul stages
        (:mod:`ops.mxufft`) — ~7x faster than the XLA FFT at the
        production mixed-radix L=200000 on TPU; keep False on CPU.

    Returns an :class:`EpochResult` of shape ``d.shape[:-1]``.
    """
    L = d.shape[-1]
    M = (2 * nint + 1) * L
    dtype = d.dtype
    if mxu_fft:
        from amaranth_twstft_tpu.ops.mxufft import fft_factored

        fft = lambda v: fft_factored(v)
        ifft = lambda v: fft_factored(v, inverse=True)
    else:
        fft = partial(jnp.fft.fft, axis=-1)
        ifft = partial(jnp.fft.ifft, axis=-1)
    if remove_mean:
        d = d - jnp.mean(d, axis=-1, keepdims=True)

    lo = mix_phasor(L, df_hz, fs, dtype=dtype)
    y = d * lo
    ffty = fft(y)

    if conjugate_data:
        prod = fcode * jnp.conj(ffty)
    else:
        prod = ffty * fcode

    if fast:
        from amaranth_twstft_tpu.ops.zoomdft import fine_window_matrix

        if fine_matrix_ri is None:
            e = fine_window_matrix(L, nint, DEFAULT_FINE_WIDTH)
            fine_matrix_ri = jnp.asarray(
                np.stack([e.real, e.imag], axis=-1),
                jnp.float64 if dtype == jnp.complex128 else jnp.float32,
            )
        W = fine_matrix_ri.shape[1]
        # Coarse peak on the un-zoomed grid (1/(2*nint+1) the IFFT work;
        # the zoomed map at multiples of (2*nint+1) is exactly the
        # un-zoomed map scaled, so this argmax is exact on that subgrid).
        coarse = ifft(prod)
        ci = jnp.argmax(jnp.abs(coarse), axis=-1).astype(jnp.int32)
        win, base = fine_window(prod, ci, fine_matrix_ri, nint)
        wmag = jnp.abs(win)
        wi = jnp.argmax(wmag, axis=-1).astype(jnp.int32)
        # Keep the parabola's neighbors inside the window (the peak sits
        # mid-window by construction; the clamp is unreachable padding).
        wi = jnp.clip(wi, 1, W - 2)
        indice = jnp.mod(base + wi, M).astype(jnp.int32)
        xm1 = take_circular(win, wi - 1)
        x0 = take_circular(win, wi)
        xp1 = take_circular(win, wi + 1)
    else:
        prnmap = ifft(spectral_zoom(prod, nint))
        mag = jnp.abs(prnmap)
        indice = jnp.argmax(mag, axis=-1).astype(jnp.int32)
        xm1, x0, xp1 = peak_neighbors(prnmap, indice)
    correction = parabolic_correction(
        jnp.abs(xm1), jnp.abs(x0), jnp.abs(xp1)
    )

    # puissance = var(y) (``godual_ranging.m:46``; ddof=0, the 1/(N-1) vs
    # 1/N difference is < 1e-5 relative at L = 2e5 and is not preserved).
    ym = y - jnp.mean(y, axis=-1, keepdims=True)
    puissance = jnp.mean(jnp.abs(ym) ** 2, axis=-1)

    if compute_snr:
        # Reference semantics: interpolate y to the 3x grid, rotate it to
        # code alignment (godual LEFT by indice-1, ``godual_ranging.m:43``,
        # ``main.cpp:332``; claudio rotates the code instead,
        # ``claudio_...separate.m:91``), multiply by the +/-1 replica and
        # take mean/var.  TPU-first identity (no 30M-element gather):
        #   mean(yint[(n+s) mod M] * code3[n])
        #     = ifft(zoom(ffty) * conj(fft(code3)))[s] / M
        # and, since code3^2 == 1 and zero-padding preserves energy,
        #   mean|yincode|^2 = sum|ffty|^2 / M^2,
        # so var = mean|yincode|^2 - |mean|^2 exactly.  Both conventions
        # align at a signal left-rotation: s = indice - 1 (godual) or
        # s = -(indice + 1) mod M (claudio).  Only ONE sample of that
        # M-point IFFT is ever read, so it is evaluated directly as an
        # O(L) reduction (:func:`ops.zoomdft.zoom_point`).
        if fcode_interp is None:
            fcode_interp = jnp.conj(fft(code_interp.astype(dtype)))
        if fcode_interp.shape[-1] == M:
            from amaranth_twstft_tpu.ops.zoomdft import zoom_positions

            g = fcode_interp[
                jnp.asarray(zoom_positions(L, nint).astype(np.int32))
            ].astype(dtype)
        else:
            g = fcode_interp.astype(dtype)  # already gathered (L,)
        if conjugate_data:
            s = jnp.mod(-(indice + 1), M)
        else:
            s = jnp.mod(indice - 1, M)
        mu = zoom_point(ffty, g, s, nint) / float(M)
        mean_abs2 = jnp.sum(jnp.abs(ffty) ** 2, axis=-1) / float(M) ** 2
        var = mean_abs2 - jnp.abs(mu) ** 2
        safe_var = jnp.where(var == 0, 1.0, var)
        snr_r = jnp.real(mu) ** 2 / safe_var
        snr_i = jnp.imag(mu) ** 2 / safe_var
        puis_code = jnp.real(mu) ** 2 + jnp.imag(mu) ** 2
        puis_noise = var
    else:
        # (dtype from the correction, not `mag` — the fast path never
        # materializes the full magnitude map)
        zeros = jnp.zeros(indice.shape, dtype=correction.dtype)
        snr_r = snr_i = puis_code = puis_noise = zeros

    return EpochResult(
        indice=indice,
        correction=correction,
        xval=x0,
        xvalm1=xm1,
        xvalp1=xp1,
        snr_r=snr_r,
        snr_i=snr_i,
        puissance=puissance,
        puissance_code=puis_code,
        puissance_noise=puis_noise,
    )


@partial(jax.jit, static_argnames=("notch_halfwidth",))
def quick_xcorr_snr(
    d: jax.Array,
    fcode: jax.Array,
    df_hz: jax.Array,
    fs: float,
    notch_halfwidth: int = 5,
) -> jax.Array:
    """Trial-correlation SNR used to validate Doppler candidates.

    ``prnmap=abs(ifft(fcode.*conj(ffty))); [pk,b]=max; prnmap(b-5:b+5)=0;
    snr = pk^2/var(prnmap)`` (``claudio_...separate.m:36-43``).  Batched
    over leading axes of ``d``/``df_hz``.
    """
    L = d.shape[-1]
    lo = mix_phasor(L, df_hz, fs, dtype=d.dtype)
    y = d * lo
    ffty = jnp.fft.fft(y, axis=-1)
    prnmap = jnp.abs(jnp.fft.ifft(fcode * jnp.conj(ffty), axis=-1))
    pk_idx = jnp.argmax(prnmap, axis=-1)
    pk = jnp.max(prnmap, axis=-1)
    # zero +/- notch_halfwidth around the peak (circularly), then variance
    k = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    dist = jnp.abs(
        jnp.mod(k[None, ...] - pk_idx[..., None] + L // 2, L) - L // 2
    )
    keep = dist > notch_halfwidth
    masked = jnp.where(keep, prnmap, 0.0)
    n_keep = jnp.sum(keep, axis=-1)
    mu = jnp.sum(masked, axis=-1) / n_keep
    var = jnp.sum(jnp.where(keep, (prnmap - mu[..., None]) ** 2, 0.0), axis=-1) / n_keep
    return pk**2 / var
