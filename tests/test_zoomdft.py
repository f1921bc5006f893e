"""Sparse zoomed-IFFT evaluation vs the full zero-padded IFFT (exactness),
and the fast windowed correlator path vs the exact path."""

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops import doppler
from amaranth_twstft_tpu.ops.correlator import correlate_epochs
from amaranth_twstft_tpu.ops.fftutils import spectral_zoom
from amaranth_twstft_tpu.ops.lfsr import prn_chips
from amaranth_twstft_tpu.ops.prn import (
    chips_to_pm1,
    code_spectrum,
    interp_code,
    upsample_zoh,
)
from amaranth_twstft_tpu.ops.zoomdft import (
    fine_window,
    fine_window_matrix,
    zoom_gather,
    zoom_point,
)


def _full_zoom_ifft(x, nint):
    return np.fft.ifft(np.asarray(spectral_zoom(jnp.asarray(x), nint)), axis=-1)


def test_zoom_point_matches_full_ifft(rng):
    L, nint = 600, 1
    M = 3 * L
    ffty = rng.normal(size=(4, L)) + 1j * rng.normal(size=(4, L))
    g_full = rng.normal(size=M) + 1j * rng.normal(size=M)
    g = zoom_gather(g_full, L, nint)
    zc = np.fft.ifft(
        np.asarray(spectral_zoom(jnp.asarray(ffty), nint)) * g_full, axis=-1
    )
    s = np.array([0, 17, M - 1, M // 2])
    got = np.asarray(zoom_point(jnp.asarray(ffty), jnp.asarray(g), jnp.asarray(s), nint))
    want = zc[np.arange(4), s]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_fine_window_matches_full_ifft(rng):
    L, nint, W = 500, 1, 16
    M = 3 * L
    prod = rng.normal(size=(3, L)) + 1j * rng.normal(size=(3, L))
    e = fine_window_matrix(L, nint, W)
    eri = jnp.asarray(np.stack([e.real, e.imag], axis=-1))
    ci = np.array([0, 250, L - 1])
    win, base = fine_window(jnp.asarray(prod), jnp.asarray(ci), eri, nint)
    full = _full_zoom_ifft(prod, nint)
    for b in range(3):
        idx = (int(base[b]) + np.arange(W)) % M
        np.testing.assert_allclose(
            np.asarray(win)[b], full[b, idx], rtol=1e-9, atol=1e-12
        )


def test_fast_correlator_matches_exact(small_cfg):
    cfg = small_cfg
    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len, cfg.seed)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip))
    fcode = code_spectrum(code, conj=True)
    code3 = interp_code(code, 3)
    (stream,) = synthesize_capture(
        cfg,
        [ChannelSim(delay_samples=311.6, doppler_hz=-150.0, amplitude=900,
                    noise_sigma=250)],
        n_seconds=1,
        seed=5,
    )
    L = cfg.samples_per_code
    d = np.stack([stream[i * L : (i + 1) * L] for i in range(8)])
    mask = doppler.window_mask(L, cfg.fs, -2000.0, 2000.0)
    df, _ = doppler.squaring_df(jnp.asarray(d), cfg.fs, mask)

    exact = correlate_epochs(
        jnp.asarray(d), fcode, df, jnp.asarray(code3), cfg.fs, nint=1
    )
    fastr = correlate_epochs(
        jnp.asarray(d), fcode, df, jnp.asarray(code3), cfg.fs, nint=1,
        fast=True,
    )
    np.testing.assert_array_equal(
        np.asarray(fastr.indice), np.asarray(exact.indice)
    )
    np.testing.assert_allclose(
        np.asarray(fastr.correction), np.asarray(exact.correction),
        rtol=1e-7, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(fastr.xval), np.asarray(exact.xval), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(fastr.snr_r), np.asarray(exact.snr_r), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(fastr.puissance), np.asarray(exact.puissance), rtol=1e-9
    )


def test_fast_correlator_claudio_convention(small_cfg):
    """Fast path parity under the conjugate-data (claudio) convention."""
    cfg = small_cfg
    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len, cfg.seed)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip))
    fcode = code_spectrum(code, conj=False)
    code3 = interp_code(code, 3)
    rng = np.random.default_rng(9)
    L = cfg.samples_per_code
    base = 700 * np.roll(code, 99).astype(np.complex128)
    d = np.stack(
        [base + rng.normal(0, 180, L) + 1j * rng.normal(0, 180, L)
         for _ in range(4)]
    )
    # claudio correlates conj(data): synthesize accordingly
    d = np.conj(d)
    df = jnp.zeros(4)
    exact = correlate_epochs(
        jnp.asarray(d), fcode, df, jnp.asarray(code3), cfg.fs,
        conjugate_data=True,
    )
    fastr = correlate_epochs(
        jnp.asarray(d), fcode, df, jnp.asarray(code3), cfg.fs,
        conjugate_data=True, fast=True,
    )
    np.testing.assert_array_equal(
        np.asarray(fastr.indice), np.asarray(exact.indice)
    )
    np.testing.assert_allclose(
        np.asarray(fastr.correction), np.asarray(exact.correction),
        rtol=1e-7, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(fastr.snr_r), np.asarray(exact.snr_r), rtol=1e-8
    )
