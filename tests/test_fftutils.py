"""Spectral-zoom and mixer-phasor numerics."""

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.ops import fftutils
from tests.oracle_numpy import octave_spectral_zoom_np, spectral_zoom_np


def test_spectral_zoom_matches_octave_construction(rng):
    L = 64
    spec = rng.normal(size=L) + 1j * rng.normal(size=L)
    ours = np.asarray(fftutils.spectral_zoom(jnp.asarray(spec), 1))
    octave = octave_spectral_zoom_np(spec, 1)
    direct = spectral_zoom_np(spec, 1)
    np.testing.assert_allclose(ours, octave, rtol=0, atol=0)
    np.testing.assert_allclose(ours, direct, rtol=0, atol=0)


def test_spectral_zoom_batched(rng):
    spec = rng.normal(size=(3, 32)) + 1j * rng.normal(size=(3, 32))
    out = np.asarray(fftutils.spectral_zoom(jnp.asarray(spec), 2))
    assert out.shape == (3, 160)
    for i in range(3):
        np.testing.assert_array_equal(out[i], spectral_zoom_np(spec[i], 2))


def test_zoom_interpolates_peak(rng):
    """Zero-pad interpolation reproduces the fractionally-delayed peak."""
    L = 256
    tau = 10.0 + 1.0 / 3.0
    k = np.fft.fftfreq(L)
    x = np.fft.ifft(np.exp(-2j * np.pi * k * tau))  # sinc peak at tau
    spec = np.fft.fft(x)
    zoom = np.asarray(fftutils.spectral_zoom(jnp.asarray(spec), 1))
    fine = np.fft.ifft(zoom)
    assert np.argmax(np.abs(fine)) == round(tau * 3)


def test_mix_phasor_f64_exact():
    n, df, fs = 5000, 1234.5, 1e5
    ph = np.asarray(fftutils.mix_phasor(n, df, fs, dtype=jnp.complex128))
    k = np.arange(n)
    ref = np.exp(-2j * np.pi * df * k / fs)
    np.testing.assert_allclose(ph, ref, atol=1e-12)


def test_mix_phasor_f32_split_accuracy():
    """The split-arithmetic f32 ramp stays within ~1e-3 rad of the exact
    ramp over 600k samples at 100 kHz offset (SURVEY.md §7.3)."""
    n, df, fs = 600_000, 99_987.0, 5e6
    ph32 = np.asarray(fftutils.mix_phasor(n, np.float32(df), fs, dtype=jnp.complex64))
    k = np.arange(n, dtype=np.float64)
    # vs the f32-quantized frequency: pure split-arithmetic error
    cq = np.float64(np.float32(np.float32(df) / np.float32(fs)))
    refq = np.exp(-2j * np.pi * cq * k)
    err_split = np.abs(np.angle(ph32 * np.conj(refq)))
    assert err_split.max() < 1e-3, err_split.max()
    # vs the true frequency: bounded by the ~1 mHz f32 quantization of
    # df/fs — far below the 0.25 Hz squaring-FFT resolution
    ref = np.exp(-2j * np.pi * df * k / fs)
    err = np.abs(np.angle(ph32 * np.conj(ref)))
    assert err.max() < 1e-2, err.max()
    # naive f32 for contrast accumulates catastrophically
    naive = np.exp(
        (-2 * np.pi * np.float32(df) / np.float32(fs))
        * k.astype(np.float32)
    )
    assert np.abs(np.angle(naive * np.conj(ref))).max() > 10 * err.max()


def test_mix_phasor_batched():
    n, fs = 1000, 1e5
    dfs = jnp.asarray([0.0, 10.0, -250.0])
    ph = np.asarray(fftutils.mix_phasor(n, dfs, fs, dtype=jnp.complex128))
    assert ph.shape == (3, n)
    np.testing.assert_allclose(ph[0], np.ones(n), atol=1e-12)
