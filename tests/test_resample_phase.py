"""Polyphase decimator and carrier-phase refinement."""

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.models.twoway import carrier_phase_refine
from amaranth_twstft_tpu.ops.resample import (
    design_lowpass,
    pick_decimate,
    polyphase_decimate,
)


def test_polyphase_matches_direct_convolution(rng):
    decim = 5
    n = 1000
    x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    h = design_lowpass(decim, taps_per_phase=6)
    got = np.asarray(polyphase_decimate(jnp.asarray(x), jnp.asarray(h), decim))
    # reference: full convolution (same alignment) then downsample
    nh = len(h)
    pad_lo = (nh - 1) // 2
    want = np.stack([
        np.convolve(row, h, mode="full")[pad_lo : pad_lo + n : decim]
        for row in x
    ])
    np.testing.assert_allclose(got, want[:, : got.shape[-1]], atol=1e-10)


def test_polyphase_antialiases_vs_pick():
    """A tone above the post-decimation Nyquist must be suppressed by the
    polyphase front-end but aliases straight through sample-picking."""
    decim, n, fs = 10, 10000, 1e6
    t = np.arange(n) / fs
    f_alias = 0.4 * fs  # above fs/(2*decim) = 50 kHz
    x = np.exp(2j * np.pi * f_alias * t)
    h = design_lowpass(decim)
    y_poly = np.asarray(polyphase_decimate(jnp.asarray(x[None]), jnp.asarray(h), decim))[0]
    y_pick = pick_decimate(x, decim)
    # skip filter edge transients
    assert np.abs(y_poly[20:-20]).max() < 1e-3
    assert np.abs(y_pick[20:-20]).max() > 0.99


def test_carrier_phase_refine_recovers_slope():
    """A linear carrier drift with BPSK half-cycle flips and outliers is
    recovered to sub-mHz (rxcomplex.cpp:702-744 semantics)."""
    rng = np.random.default_rng(3)
    n, eps = 200, 25.0
    t = np.arange(n) / eps
    df_true = 0.084  # Hz
    phi = 0.11 + df_true * t + rng.normal(0, 0.004, n)
    # BPSK ambiguity: random half-cycle flips
    flips = rng.integers(0, 2, n) * 0.5
    wrapped = ((phi + flips + 0.5) % 1.0) - 0.5
    xval = np.exp(2j * np.pi * wrapped)
    # inject outliers
    xval[50] *= np.exp(2j * np.pi * 0.2)
    out = carrier_phase_refine(xval, epochs_per_second=eps)
    assert abs(out["df_hz"] - df_true) < 2e-3, out["df_hz"]
    assert out["weights"].sum() >= n - 5


def test_carrier_smooth_delays_tracks_wander():
    """Carrier smoothing: the smoothed series follows the TRUE delay
    wander (encoded in the peak phases at the 70 MHz IF) with far less
    noise than the code-tracking series, and keeps the code series'
    absolute level (the carrier alone is cycle-ambiguous)."""
    from amaranth_twstft_tpu.models.twoway import carrier_smooth_delays

    rng = np.random.default_rng(7)
    n, eps, fc = 500, 25.0, 70e6
    t = np.arange(n) / eps
    # true delay: level + drift + 150 ps sinusoidal wander
    tau_ns = 5000.0 + 0.8 * t + 0.15 * np.sin(2 * np.pi * 0.3 * t)
    code_ns = tau_ns + rng.normal(0, 0.08, n)  # 80 ps code noise
    # peak phase encodes the true delay: phi = -fc * tau (cycles), with
    # 0.2 milli-cycle phase noise (= 2.9 ps at the 14.3 ns IF cycle)
    phi = -fc * tau_ns * 1e-9 + rng.normal(0, 2e-4, n)
    xval = 1000.0 * np.exp(2j * np.pi * phi)
    sm = carrier_smooth_delays(code_ns, xval, fc, epochs_per_second=eps)
    # absolute level preserved from the code series
    assert abs(np.mean(sm) - np.mean(tau_ns)) < 0.05
    # the wander is recovered: error vs truth far below the code noise
    err_sm = np.std(sm - tau_ns)
    err_code = np.std(code_ns - tau_ns)
    assert err_sm < 0.15 * err_code, (err_sm, err_code)
    assert err_sm < 0.01, err_sm  # sub-10 ps about the truth
