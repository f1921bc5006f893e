"""Independent float64 NumPy oracle of the reference processing math.

A direct expression of the formulas documented in
``processing/Octave/godual_ranging.m:12-49`` (written from the math, not
the code), used only to validate the JAX kernels — the reference's own
oracle pattern (gateware vs pure-Python model, SURVEY.md §4.1) applied as
"TPU kernel vs NumPy reference".
"""

from __future__ import annotations

import numpy as np


def spectral_zoom_np(spec: np.ndarray, nint: int) -> np.ndarray:
    L = spec.shape[-1]
    half = L // 2
    out = np.zeros(spec.shape[:-1] + ((2 * nint + 1) * L,), dtype=spec.dtype)
    out[..., :half] = spec[..., :half]
    out[..., -(L - half):] = spec[..., half:]
    return out


def octave_spectral_zoom_np(spec: np.ndarray, nint: int) -> np.ndarray:
    """Literal Octave construction: fftshift -> pad both sides -> fftshift."""
    L = len(spec)
    s = np.fft.fftshift(spec)
    padded = np.concatenate(
        [np.zeros(L * nint, dtype=spec.dtype), s, np.zeros(L * nint, dtype=spec.dtype)]
    )
    return np.fft.fftshift(padded)


def processing_oracle(d: np.ndarray, fs: float, fcode: np.ndarray,
                      code_interp: np.ndarray, freq: np.ndarray,
                      k_mask: np.ndarray, nint: int = 1):
    """Per-epoch chain: squaring df, mix, correlate, interpolate, SNR."""
    d = d - d.mean()
    d2 = np.fft.fftshift(np.abs(np.fft.fft(d * d)))
    idx = int(np.argmax(np.where(k_mask, d2, -np.inf)))
    df = freq[idx] / 2.0
    temps = np.arange(len(d)) / fs
    y = d * np.exp(-2j * np.pi * df * temps)
    ffty = np.fft.fft(y)
    prod = ffty * fcode
    prnmap = np.fft.ifft(octave_spectral_zoom_np(prod, nint))
    indice = int(np.argmax(np.abs(prnmap)))
    x0 = prnmap[indice]
    xm1 = prnmap[indice - 1]
    xp1 = prnmap[(indice + 1) % len(prnmap)]
    correction = (abs(xm1) - abs(xp1)) / (abs(xm1) + abs(xp1) - 2 * abs(x0)) / 2
    # SNR
    yint = np.fft.ifft(spectral_zoom_np(ffty, nint))
    rolled = np.roll(yint, -(indice - 1))
    yincode = rolled * code_interp
    mu = yincode.mean()
    var = np.mean(np.abs(yincode - mu) ** 2)
    snr_r = mu.real**2 / var
    snr_i = mu.imag**2 / var
    return {
        "df": df,
        "indice": indice,
        "correction": correction,
        "xval": x0,
        "snr_r": snr_r,
        "snr_i": snr_i,
        "puissance": np.mean(np.abs(y - y.mean()) ** 2),
        "puissance_code": abs(mu) ** 2,
        "puissance_noise": var,
    }
