"""Fine frequency refinement: pull-in range + accelerator-path parity.

The phase-drift refinement (``godual_ranging_fftw.py:35-39``) is
re-designed around the squared signal (see ``ops/doppler.fine_df_phase_drift``
docstring); these tests pin down the regime it is valid in instead of
assuming it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from amaranth_twstft_tpu.ops import boundary
from amaranth_twstft_tpu.ops.doppler import fine_df_phase_drift
from amaranth_twstft_tpu.ops.lfsr import prn_chips
from amaranth_twstft_tpu.ops.prn import chips_to_pm1, upsample_zoh


def _bpsk(cfg, df_hz, n=None, noise=0.0, seed=0):
    """One epoch of coarsely-mixed BPSK with residual ``df_hz`` left over."""
    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip))
    L = n or len(code)
    code = np.resize(code, L)
    t = np.arange(L) / cfg.fs
    rng = np.random.default_rng(seed)
    y = code * np.exp(2j * np.pi * df_hz * t)
    if noise:
        y = y + noise * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    return jnp.asarray(y)


def test_pull_in_range(small_cfg):
    """Residuals within the documented pull-in recover to < 0.5 Hz.

    With auto defaults at L=2000/fs=1e5: boxcar=100, stride=1 -> pull-in
    min(fs/(4*stride), fs/(2*boxcar)) = 500 Hz.  The refinement is used
    after the coarse squaring-FFT whose worst residual is a half df-bin
    (12.5 Hz here) — test an order of magnitude beyond that.
    """
    for df in [-120.0, -12.5, -1.3, 0.0, 0.7, 5.0, 12.5, 60.0, 120.0]:
        est = float(fine_df_phase_drift(_bpsk(small_cfg, df), small_cfg.fs))
        assert abs(est - df) < 0.5, (df, est)


def test_pull_in_with_noise(small_cfg):
    """Sub-Hz recovery holds at SNR comparable to the chain tests."""
    errs = []
    for seed in range(8):
        y = _bpsk(small_cfg, 5.0, noise=0.3, seed=seed)
        errs.append(abs(float(fine_df_phase_drift(y, small_cfg.fs)) - 5.0))
    assert np.median(errs) < 0.5, errs


def test_out_of_range_is_out_of_range(small_cfg):
    """Beyond the boxcar main-lobe limit the estimate degrades — the
    documented bound is real, not conservative fiction."""
    df = 2500.0  # >> fs/(2*boxcar) = 500 Hz
    est = float(fine_df_phase_drift(_bpsk(small_cfg, df), small_cfg.fs))
    assert abs(est - df) > 10.0


def test_batched_matches_single(small_cfg):
    ys = jnp.stack([_bpsk(small_cfg, df) for df in (3.0, -7.0, 11.0)])
    batched = np.asarray(fine_df_phase_drift(ys, small_cfg.fs))
    singles = [float(fine_df_phase_drift(y, small_cfg.fs)) for y in ys]
    np.testing.assert_allclose(batched, singles, rtol=1e-9)


def test_boundary_step_fine_freq(small_cfg):
    """make_ranging_step(fine_freq=True) — the accelerator path — refines
    df like the host path (ADVICE r1: the flag used to be silently
    ignored on accelerators)."""
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.models.godual import build_replica, df_window
    from amaranth_twstft_tpu.ops.doppler import window_mask
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file

    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        code_path = os.path.join(tmp, "code.bin")
        write_prn_file(code_path, small_cfg.bit_len, small_cfg.code_len,
                       small_cfg.taps)
        proc = ProcessingConfig(fine_freq=True)
        rep = build_replica(code_path, small_cfg, proc)
        meas, _ = synthesize_capture(
            small_cfg,
            [ChannelSim(100.0, 130.0, amplitude=2000, noise_sigma=100),
             ChannelSim(0.0, 0.0, amplitude=2000, noise_sigma=100)],
            n_seconds=1, seed=3,
        )
        L = rep.samples_per_code
        mask = window_mask(L, small_cfg.fs, -2000, 2000)
        epochs = meas[: (len(meas) // L) * L].reshape(-1, L)

        coarse_step = boundary.make_ranging_step(
            rep.fcode, rep.code_interp, mask, small_cfg.fs, fine_freq=False)
        fine_step = boundary.make_ranging_step(
            rep.fcode, rep.code_interp, mask, small_cfg.fs, fine_freq=True)
        iq = jnp.asarray(boundary.pack_complex(epochs))
        df_c = np.asarray(coarse_step(iq).df)
        df_f = np.asarray(fine_step(iq).df)
        assert np.median(np.abs(df_f - 130.0)) < 1.0
        assert np.median(np.abs(df_f - 130.0)) < np.median(np.abs(df_c - 130.0))
