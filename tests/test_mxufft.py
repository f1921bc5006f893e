"""MXU-factored FFT vs jnp.fft (exactness at fp precision)."""

import jax.numpy as jnp
import numpy as np
import pytest

from amaranth_twstft_tpu.ops.mxufft import fft_factored, good_factors


def test_good_factors():
    assert np.prod(good_factors(200000)) == 200000
    assert max(good_factors(200000)) <= 128
    assert np.prod(good_factors(600000)) == 600000
    assert np.prod(good_factors(2000)) == 2000
    with pytest.raises(ValueError):
        good_factors(2 * 131)  # prime 131 > 128


@pytest.mark.parametrize("n", [2000, 6000, 4096, 350])
def test_fft_matches_jnp(rng, n):
    x = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    got = np.asarray(fft_factored(jnp.asarray(x)))
    want = np.fft.fft(x, axis=-1)
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-10)


@pytest.mark.parametrize("n", [2000, 1875])
def test_ifft_matches_jnp(rng, n):
    x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    got = np.asarray(fft_factored(jnp.asarray(x), inverse=True))
    want = np.fft.ifft(x, axis=-1)
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-10)


def test_roundtrip_production_length_f32():
    """fp32 accuracy at L=200000 stays ~1e-5 relative (error budget of
    SURVEY.md §7.3)."""
    rng = np.random.default_rng(0)
    n = 200000
    x = (rng.normal(size=(1, n)) + 1j * rng.normal(size=(1, n))).astype(
        np.complex64
    )
    y = np.asarray(fft_factored(jnp.asarray(x)))
    back = np.asarray(fft_factored(jnp.asarray(y), inverse=True))
    err = np.max(np.abs(back - x)) / np.max(np.abs(x))
    assert err < 1e-4, err
    # and against the float64 truth
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    rel = np.max(np.abs(y - want)) / np.max(np.abs(want))
    assert rel < 5e-5, rel
