"""FFT-domain helpers: zero-pad spectral interpolation, precise mixers.

The reference interpolates every correlation peak 3x by zero-padding the
*middle* of the product spectrum before the inverse FFT:

- Octave: ``prnmap=fftshift(ffty.*fcode); prnmap=[zeros(L*Nint);prnmap;
  zeros(L*Nint)]; prnmap=ifft(fftshift(prnmap))`` — i.e. low-frequency
  halves at the array ends, zeros in the middle
  (``processing/Octave/godual_ranging.m:26-28``),
- C++: ``ii = (i < L/2) ? i : i + 2L`` placement into a 3L buffer
  (``processing/CPP/main.cpp:289-304``).

Both are the same operation, implemented here directly as
:func:`spectral_zoom`.  NOTE the reference does **not** rescale after
padding, so interpolated amplitudes keep the original 1/N ifft scaling of
the *long* transform; we preserve that for numerical parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spectral_zoom",
    "spectral_zoom_signal",
    "mix_phasor",
    "fftfreq_shifted",
]


def spectral_zoom(spectrum: jax.Array, nint: int) -> jax.Array:
    """Zero-pad a natural-order spectrum from length L to (2*nint+1)*L.

    Keeps bins [0, L/2) at the start and [L/2, L) at the end of the long
    buffer (``main.cpp:289-294``).  Works on batched inputs (pads the last
    axis).  For even L this assigns the Nyquist bin to the negative side,
    exactly like the reference.
    """
    L = spectrum.shape[-1]
    half = L // 2
    pad = (2 * nint) * L
    lead = spectrum[..., :half]
    tail = spectrum[..., half:]
    zeros = jnp.zeros(spectrum.shape[:-1] + (pad,), dtype=spectrum.dtype)
    return jnp.concatenate([lead, zeros, tail], axis=-1)


def spectral_zoom_signal(ffty: jax.Array, nint: int) -> jax.Array:
    """Interpolated time signal ``yint = ifft(spectral_zoom(fft(y)))``.

    The SNR path of the reference (``godual_ranging.m:38-41``,
    ``main.cpp:319-327``).
    """
    return jnp.fft.ifft(spectral_zoom(ffty, nint), axis=-1)


def fftfreq_shifted(n: int, fs: float) -> np.ndarray:
    """The reference's frequency axis: ``linspace(-fs/2, fs/2, n)``.

    NOTE this is *not* ``fftshift(fftfreq)``: the reference uses an
    inclusive linspace with step fs/(n-1) (``godual_ranging.m:73``,
    ``main.cpp:399,734-758``).  Preserved exactly since the df estimate is
    read off this axis.
    """
    return np.linspace(-fs / 2, fs / 2, n)


@partial(jax.jit, static_argnums=(0,), static_argnames=("dtype",))
def _mix_phasor_f32(n: int, cycles_per_sample, dtype=jnp.complex64):
    """Split-arithmetic phase ramp accurate to ~1e-4 cycles over n ~ 1e6.

    Computes ``exp(-2j*pi*frac(k*c))`` without catastrophic f32 rounding of
    ``k*c`` (k up to ~1e6): write k = q*2048 + r, reduce q*frac(2048*c) and
    r*c modulo 1 separately.  This is the TPU float32 replacement for the
    reference's float64 ``exp(-j*2*pi*df*temps)`` (``godual_ranging.m:17``,
    ``main.cpp:278-284``); SURVEY.md §7.3 "float64 vs TPU float32".
    """
    real_dtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    c = jnp.asarray(cycles_per_sample, real_dtype)[..., None]
    c = c - jnp.floor(c)
    c2048 = 2048.0 * c
    c2048 = c2048 - jnp.floor(c2048)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    q = (k // 2048).astype(real_dtype)
    r = (k % 2048).astype(real_dtype)
    ph = q * c2048
    ph = ph - jnp.floor(ph)
    ph2 = r * c
    ph2 = ph2 - jnp.floor(ph2)
    phase = ph + ph2
    phase = phase - jnp.floor(phase)
    ang = (-2.0 * jnp.pi) * phase
    return jnp.cos(ang) + 1j * jnp.sin(ang)


def mix_phasor(n: int, df_hz, fs: float, dtype=jnp.complex64) -> jax.Array:
    """Local-oscillator phasor ``exp(-2j*pi*df*k/fs)``, k = 0..n-1.

    ``df_hz`` may be a traced scalar or batch of scalars (device-computed
    Doppler); output shape is ``df.shape + (n,)``.  In complex128 mode the
    direct product is exact enough; in complex64 mode the modular split of
    :func:`_mix_phasor_f32` bounds the phase error to ~1e-4 cycles over
    600 k samples (vs ~0.03 cycles naively).
    """
    if dtype == jnp.complex128:
        k = jnp.arange(n, dtype=jnp.float64)
        c = (jnp.asarray(df_hz, jnp.float64) / fs)[..., None]
        ang = -2.0 * jnp.pi * c * k
        return jnp.cos(ang) + 1j * jnp.sin(ang)
    return _mix_phasor_f32(n, jnp.asarray(df_hz) / fs, dtype=jnp.complex64)
