"""Peak refinement: parabolic interpolation, HRC discriminator, robust stats.

Behavioral specs:

- 3-point parabolic correction ``(|x-1|-|x+1|) / (|x-1|+|x+1|-2|x0|) / 2``
  (``processing/Octave/godual_ranging.m:29-33``,
  ``processing/CPP/main.cpp:305-310``),
- High-Resolution-Correlator two-parabola discriminator of the DLL/PLL
  receiver (``experiments/231001_DLL_PLL/rxcomplex.cpp:649-659``),
- median / IQR 3-sigma outlier rejection (``rxcomplex.cpp:699-700`` via
  ``kth_smallest``; sigma = IQR/1.349).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "take_circular",
    "peak_neighbors",
    "parabolic_correction",
    "hrc_correction",
    "median_iqr_sigma",
    "weighted_linear_fit",
]


def take_circular(x: jax.Array, idx) -> jax.Array:
    """Gather along the last axis with circular (mod-N) indexing."""
    n = x.shape[-1]
    idx = jnp.mod(idx, n)
    return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def peak_neighbors(prnmap: jax.Array, indice: jax.Array):
    """(x[-1], x[0], x[+1]) complex values around the peak, circularly.

    The reference indexes ``indice-1``/``indice+1`` directly
    (``godual_ranging.m:31-32``); claudio wraps explicitly at the edges
    (``claudio_...separate.m:71-80``) — circular indexing covers both.
    """
    xm1 = take_circular(prnmap, indice - 1)
    x0 = take_circular(prnmap, indice)
    xp1 = take_circular(prnmap, indice + 1)
    return xm1, x0, xp1


def parabolic_correction(am1, a0, ap1):
    """Sub-sample offset of a peak from 3 magnitudes.

    ``(am1 - ap1) / (am1 + ap1 - 2*a0) / 2`` (``godual_ranging.m:33``).
    The denominator is negative at a true maximum; at a degenerate flat
    triple it would be 0 — the reference does not guard this, we return 0
    there to keep the kernel total.
    """
    den = am1 + ap1 - 2.0 * a0
    num = am1 - ap1
    safe = jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, 0.0, num / safe / 2.0)


def hrc_correction(corr, pk_idx):
    """High-Resolution-Correlator discriminator: parabola(+/-1) - parabola(+/-2).

    ``(c[-1]-c[+1])/(c[-1]-2c[0]+c[+1]) - (c[-2]-c[+2])/(c[-2]-2c[0]+c[+2])``
    (``rxcomplex.cpp:649-659``), evaluated on the correlation *power* lag
    bank ``corr`` (..., n_lags) at integer peak ``pk_idx``.
    """
    cm2 = take_circular(corr, pk_idx - 2)
    cm1 = take_circular(corr, pk_idx - 1)
    c0 = take_circular(corr, pk_idx)
    cp1 = take_circular(corr, pk_idx + 1)
    cp2 = take_circular(corr, pk_idx + 2)

    def _ratio(a, b, c):
        den = a - 2.0 * b + c
        safe = jnp.where(den == 0, 1.0, den)
        return jnp.where(den == 0, 0.0, (a - c) / safe)

    return _ratio(cm1, c0, cp1) - _ratio(cm2, c0, cp2)


def median_iqr_sigma(x: jax.Array, w: jax.Array | None = None):
    """(median, IQR/1.349) — the DLL/PLL robust location/scale estimate
    (``rxcomplex.cpp:699-700``).  ``w`` masks invalid entries (weight 0)."""
    if w is not None:
        # Push masked entries to NaN and use nan-aware quantiles.
        x = jnp.where(w > 0, x, jnp.nan)
        med = jnp.nanmedian(x, axis=-1)
        q3 = jnp.nanquantile(x, 0.75, axis=-1)
        q1 = jnp.nanquantile(x, 0.25, axis=-1)
    else:
        med = jnp.median(x, axis=-1)
        q3 = jnp.quantile(x, 0.75, axis=-1)
        q1 = jnp.quantile(x, 0.25, axis=-1)
    return med, (q3 - q1) / 1.349


def weighted_linear_fit(t: jax.Array, y: jax.Array, w: jax.Array):
    """Weighted least-squares line fit y ~ c0 + c1*t.

    Replaces ``gsl_fit_wlinear`` (``rxcomplex.cpp:728-744``).  Returns
    (c0, c1, chi2) with chi2 the weighted sum of squared residuals.
    Degenerate (all-zero-weight) batches return zeros.
    """
    sw = jnp.sum(w, axis=-1)
    safe_sw = jnp.where(sw == 0, 1.0, sw)
    mt = jnp.sum(w * t, axis=-1) / safe_sw
    my = jnp.sum(w * y, axis=-1) / safe_sw
    dt = t - mt[..., None]
    dy = y - my[..., None]
    stt = jnp.sum(w * dt * dt, axis=-1)
    safe_stt = jnp.where(stt == 0, 1.0, stt)
    c1 = jnp.sum(w * dt * dy, axis=-1) / safe_stt
    c1 = jnp.where(stt == 0, 0.0, c1)
    c0 = my - c1 * mt
    resid = dy - c1[..., None] * dt
    chi2 = jnp.sum(w * resid * resid, axis=-1)
    ok = sw > 0
    return jnp.where(ok, c0, 0.0), jnp.where(ok, c1, 0.0), jnp.where(ok, chi2, 0.0)
