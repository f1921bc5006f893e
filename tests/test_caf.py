"""Dense CAF: grid construction, peak recovery, Doppler refinement."""

import numpy as np
import jax.numpy as jnp

from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops import caf
from amaranth_twstft_tpu.ops.lfsr import prn_chips
from amaranth_twstft_tpu.ops.prn import (
    chips_to_pm1,
    code_spectrum,
    interp_code,
    upsample_zoh,
)


def _replica(cfg):
    code = chips_to_pm1(
        upsample_zoh(prn_chips(cfg.bit_len, cfg.taps, cfg.code_len),
                     cfg.samples_per_chip)
    )
    return code, jnp.asarray(code_spectrum(code)), jnp.asarray(interp_code(code, 3))


def test_doppler_bins_integer_grid(small_cfg):
    L = small_cfg.samples_per_code
    shifts, freqs = caf.doppler_bins(small_cfg.fs, L, -500, 500, 100.0)
    bin_hz = small_cfg.fs / L  # 50 Hz
    np.testing.assert_allclose(np.asarray(shifts) * bin_hz, freqs)
    assert freqs[0] == -500 and freqs[-1] == 500
    assert freqs[1] - freqs[0] == 100.0


def test_caf_peaks_match_bruteforce(small_cfg, rng):
    """The spectral-roll CAF equals brute-force mixing per hypothesis."""
    cfg = small_cfg
    code, fcode, _ = _replica(cfg)
    L = cfg.samples_per_code
    d = (600 * np.roll(code, 90).astype(complex)
         * np.exp(2j * np.pi * 150.0 * np.arange(L) / cfg.fs)
         + rng.normal(0, 100, L) + 1j * rng.normal(0, 100, L))
    shifts, freqs = caf.doppler_bins(cfg.fs, L, -300, 300, 50.0)
    peaks = caf.caf_peaks(jnp.asarray(d[None]), fcode, shifts, chunk=4)
    # brute force (with the chain's mean removal, godual_ranging.m:80)
    t = np.arange(L) / cfg.fs
    d = d - d.mean()
    for h, f in enumerate(freqs):
        y = d * np.exp(-2j * np.pi * f * t)
        corr = np.fft.ifft(np.fft.fft(y) * np.asarray(fcode))
        np.testing.assert_allclose(
            float(peaks.power[0, h]), np.max(np.abs(corr) ** 2), rtol=1e-8
        )
        assert int(peaks.index[0, h]) == int(np.argmax(np.abs(corr)))


def test_caf_search_recovers_doppler_and_delay(small_cfg):
    cfg = small_cfg
    (stream,) = synthesize_capture(
        cfg,
        [ChannelSim(delay_samples=123.4, doppler_hz=163.0, amplitude=800,
                    noise_sigma=150)],
        n_seconds=1,
        seed=6,
    )
    code, fcode, code3 = _replica(cfg)
    L = cfg.samples_per_code
    d = stream[: 10 * L].reshape(10, L)
    res = caf.caf_search(
        jnp.asarray(d), fcode, code3, cfg.fs, -500.0, 500.0, 50.0, nint=1
    )
    delay = (np.asarray(res.epoch.indice) + np.asarray(res.epoch.correction)) / 3
    np.testing.assert_allclose(delay, 123.4, atol=0.1)
    # refined Doppler beats the 50 Hz grid: within ~10 Hz of truth
    np.testing.assert_allclose(np.asarray(res.df_hz), 163.0, atol=10.0)
    # coarse snaps to the nearest 50 Hz hypothesis
    np.testing.assert_allclose(np.asarray(res.df_coarse_hz), 150.0)
