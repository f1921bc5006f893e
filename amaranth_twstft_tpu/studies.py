"""Estimator-validation studies — the reference's simulation campaigns.

The reference validates its SNR estimators and interpolation choices with
synthetic sweeps (``experiments/221127_SNR/simu_snr.m``,
``experiments/221127_SNR/interpolation_effect.m``,
``experiments/2209_SNR_simulations/simu_snr.m``; theory in
``experiments/221127_SNR/README.md:1-27``).  Conclusions encoded here and
asserted by ``tests/test_studies.py``:

- the **despreading estimator** ("claudio", ``mean(x·c)^2 / var(x·c)``)
  tracks the true SNR across the whole range — it is the production
  estimator (``godual_ranging.m:44-48``);
- the **cross-correlation estimator** (peak² over correlation-floor
  variance) saturates at high SNR: the code's autocorrelation self-noise
  rises above the additive noise (README:20-24);
- code/correlation **interpolation factors do not change** the
  despreading estimate (``interpolation_effect.m:14-31``) — which is why
  the production chain interpolates only for *timing*, never for SNR.

Everything is batched over the sweep axis: one vmapped program per study,
no per-point Python loops (TPU-first; the reference loops in Octave).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "snr_despreading",
    "snr_xcorr_floor",
    "snr_estimator_sweep",
    "interpolation_effect",
]


def snr_despreading(x: np.ndarray, code: np.ndarray) -> np.ndarray:
    """``mean(x.*c)^2 / var(x.*c)`` (``interpolation_effect.m:28``,
    ``godual_ranging.m:44-45``) — batched over leading axes of x."""
    y = x * code
    mu = np.mean(y, axis=-1)
    return mu**2 / np.var(y, axis=-1)


def snr_xcorr_floor(x: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Correlation-peak SNR: ``max|xc|^2 / var(xc_floor) / sqrt(N)``
    (``interpolation_effect.m:26``).  The floor is the first half of the
    correlation away from the peak (the reference slices
    ``zc(1:end/2-10)``; with the peak at lag 0 we mask ±10 lags)."""
    n = x.shape[-1]
    xc = np.fft.ifft(
        np.fft.fft(x, axis=-1) * np.conj(np.fft.fft(code)), axis=-1
    )
    mag = np.abs(xc)
    pk = np.max(mag, axis=-1)
    pos = np.argmax(mag, axis=-1)
    k = np.arange(n)
    dist = np.abs((k[None, :] - pos[..., None] + n // 2) % n - n // 2)
    floor = np.where(dist > 10, xc, np.nan)
    var = np.nanvar(floor, axis=-1)
    return pk**2 / var / np.sqrt(n)


def snr_estimator_sweep(
    code: np.ndarray,
    snr_true: np.ndarray,
    seed: int = 0,
) -> dict:
    """One row of ``simu_snr.m``'s figure: both estimators vs truth.

    ``code`` is a ±1 PRN replica; ``snr_true`` the linear target SNRs
    (signal scaled as code/B with unit noise, ``simu_snr.m:22-27``).
    Returns dB arrays aligned with ``snr_true``.
    """
    rng = np.random.default_rng(seed)
    n = len(code)
    noise = rng.standard_normal((len(snr_true), n))
    noise = noise - noise.mean(axis=-1, keepdims=True)
    nvar = np.var(noise, axis=-1)
    scale = np.sqrt(snr_true * nvar / np.var(code))
    x = code[None, :] * scale[:, None] + noise
    return {
        "snr_th_db": 10 * np.log10(scale**2 * np.var(code) / nvar),
        "claudio_db": 10 * np.log10(snr_despreading(x, code.astype(float))),
        "xcorr_db": 10 * np.log10(np.real(snr_xcorr_floor(x, code.astype(float)))),
    }


def interpolation_effect(
    code: np.ndarray,
    factors=(1e-3, 1e-2, 1e-1, 1.0, 10.0, 100.0),
    interp_code: int = 1,
    seed: int = 3,
) -> dict:
    """``interpolation_effect.m``: the despreading estimate is invariant
    under code zero-order-hold interpolation; returns estimates for each
    noise ``factor`` (x = n/factor + c, true linear SNR = factor² · 12·
    var(c), uniform noise var 1/12)."""
    from amaranth_twstft_tpu.ops.prn import upsample_zoh

    c = upsample_zoh(code.astype(float), interp_code)
    rng = np.random.default_rng(seed)
    n = rng.uniform(-0.5, 0.5, len(c))
    rows = {"factor_sq": [], "snr_claudio": [], "snr_th": []}
    for f in factors:
        x = n / f + c
        rows["factor_sq"].append(f**2)
        rows["snr_claudio"].append(float(snr_despreading(x, c)))
        rows["snr_th"].append(float(np.var(c) / np.var(n / f)))
    return {k: np.asarray(v) for k, v in rows.items()}
