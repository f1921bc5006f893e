"""Code-replica construction: ZOH resampling, +/-1 mapping, code spectra.

Behavioral spec: every processing chain builds its replica by repeating each
chip fs/chip_rate (=2) times, mapping 0/1 -> -1/+1 and taking an FFT:

- Octave archived chain: ``code=repelems(code, ...*2); code=2*code-1;
  fcode=conj(fft(code'))`` (``processing/Octave/godual_ranging.m:63-66``),
- C++ chain: same + Hamming window on the *natural-order* spectrum
  (``processing/CPP/main.cpp:696-719``),
- claudio chain: ``fcode=fft(code')`` without the conjugate — the data is
  conjugated instead (``acquisition/claudio_aligned_code_ranging_separate.m:122-124,59``),
- DLL/PLL receiver: replica sampled at fs then low-pass filtered in the
  frequency domain (``experiments/231001_DLL_PLL/rxcomplex.cpp:416-433``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "upsample_zoh",
    "chips_to_pm1",
    "code_spectrum",
    "hamming",
    "interp_code",
    "lowpass_spectrum_mask",
]


def upsample_zoh(code, factor: int):
    """Zero-order-hold upsampling: repeat each chip ``factor`` times.

    Equivalent to Octave ``repelems(code, [1:n; factor*ones])``
    (``godual_ranging.m:63-64``) and the C++ x2 duplication
    (``processing/CPP/main.cpp:697-702``).  Works on numpy and jax arrays.
    """
    xp = jnp if isinstance(code, jnp.ndarray) else np
    return xp.repeat(code, factor)


def chips_to_pm1(chips, dtype=np.float64):
    """Map 0/1 chips to -1/+1 (``godual_ranging.m:65``: ``code=2*code-1``)."""
    return chips.astype(dtype) * 2 - 1


def hamming(n: int, dtype=np.float64) -> np.ndarray:
    """Symmetric Hamming window, the armadillo/Octave definition
    0.54 - 0.46 cos(2 pi k/(n-1)) used at ``processing/CPP/main.cpp:717``."""
    k = np.arange(n, dtype=dtype)
    return 0.54 - 0.46 * np.cos(2 * np.pi * k / (n - 1))


def code_spectrum(
    code_pm1,
    conj: bool = True,
    hamming_window: bool = False,
):
    """FFT of the +/-1 sampled replica, optionally conjugated / windowed.

    ``conj=True`` is the godual/C++ convention (``godual_ranging.m:66``,
    ``main.cpp:712-714``); ``conj=False`` the claudio one
    (``claudio_...separate.m:124``).  ``hamming_window=True`` multiplies the
    *unshifted* spectrum by a symmetric Hamming window exactly as the C++
    does (``main.cpp:717-719``) — note this weights the band edges around
    +/-fs/2 up and DC down; the quirk is preserved deliberately for
    numerical parity with the C producer.

    Computed on host (NumPy): replica construction is one-time setup, and
    complex arrays must not cross the device boundary on the axon TPU
    (see ``ops/boundary.py``).
    """
    f = np.fft.fft(np.asarray(code_pm1).astype(np.float64))
    if conj:
        f = np.conj(f)
    if hamming_window:
        f = f * hamming(len(f))
    return f


def interp_code(code_pm1, interp_factor: int):
    """Replica oversampled to the interpolated correlation grid.

    ``codetmp = repelems(code, ... * (2*Nint+1))`` (``godual_ranging.m:42``);
    used by the SNR estimator to re-modulate the aligned signal.
    """
    return upsample_zoh(code_pm1, interp_factor)


def lowpass_spectrum_mask(n: int, df_hz: float, fmax: float, fmin: float):
    """Brick-wall low-pass mask on a natural-order length-``n`` spectrum.

    Frequency of bin k is ``k*df_hz`` for k < n/2 and ``(k-n)*df_hz`` above;
    bins outside (fmin, fmax) are zeroed — the DLL/PLL replica filter
    (``experiments/231001_DLL_PLL/rxcomplex.cpp:416-433``).
    """
    k = np.arange(n)
    freq = np.where(k < n / 2, k, k - n) * df_hz
    return ((freq > fmin) & (freq < fmax)).astype(np.float64)
