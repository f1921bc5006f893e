"""Two-way solver: policies + end-to-end dual-station with known offset."""

import numpy as np
import pytest

import jax.numpy as jnp

from amaranth_twstft_tpu.config import ProcessingConfig, StationConfig
from amaranth_twstft_tpu.models import godual, twoway
from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.models.twoway import GatingPolicy
from amaranth_twstft_tpu.ops.lfsr import write_prn_file
from amaranth_twstft_tpu.utils import io


def test_gate_epochs_basic():
    x = np.ones(100, complex)
    x[:5] = 0.01  # TX off at start
    x[60:] = 0.01  # TX off at end -> gap
    k = twoway.gate_epochs(x)
    assert k[0] == 5 + 11  # drop_first after the first good sample
    assert k[-1] <= 60


def test_trim_sample_loss():
    d = np.linspace(0, 1, 100)
    d[50:] += 5.0  # 5 ns jump
    out = twoway.trim_sample_loss(d)
    # the reference keeps 1..kk-1 (go_1s.m:99), dropping the sample
    # right before the jump as well
    assert len(out) == 49


def test_fold_ambiguity():
    res = np.zeros(50)
    res[10] = 200.0 / 3.0  # one interpolated-sample slip
    res[11] = -200.0 / 3.0
    out = twoway.fold_sample_ambiguity(res)
    np.testing.assert_allclose(out, 0.0, atol=1e-9)


def test_twoway_residual_outliers():
    n = 100
    rng = np.random.default_rng(0)
    op_re = 1000 + rng.normal(0, 0.1, n)
    op_lo = 500 + rng.normal(0, 0.1, n)
    lt_re = 900 + rng.normal(0, 0.1, n)
    lt_lo = 450 + rng.normal(0, 0.1, n)
    op_re[7] += 50.0  # gross outlier
    res = twoway.twoway_residual(op_re, op_lo, lt_re, lt_lo)
    assert np.isnan(res[7])
    expected = 0.5 * ((1000 - 500) - (900 - 450))
    assert abs(np.nanmean(res) - expected) < 0.1


def test_solve_session_recovers_clock_offset():
    """Synthetic per-code series with known 12.5 ns clock offset."""
    rng = np.random.default_rng(1)
    n = 250  # 10 s of codes
    x = 12.5  # ns clock offset
    path, d_op, d_lt = 1000.0, 430.0, 430.0
    op_lo = d_op + rng.normal(0, 0.2, n)
    lt_lo = d_lt + rng.normal(0, 0.2, n)
    op_re = path + x + rng.normal(0, 0.3, n)
    lt_re = path - x + rng.normal(0, 0.3, n)
    sol = twoway.solve_session(op_lo, op_re, lt_lo, lt_re, 1755400000.0)
    assert abs(sol.res_mean - x) < 0.1
    assert sol.res_std < 0.5
    assert sol.one_second.shape[0] == n // 25 - 1
    # MJD sanity: 2025-08-17-ish epoch
    assert 60000 < sol.mjd < 62000


def test_end_to_end_dual_station(small_cfg, tmp_path):
    """BASELINE config[2]: two stations' captures -> ranging chains ->
    two-way solve, against a known injected clock offset."""
    fs = small_cfg.fs
    code_op = str(tmp_path / "code_op.bin")
    code_lt = str(tmp_path / "code_lt.bin")
    write_prn_file(code_op, small_cfg.bit_len, small_cfg.code_len, 9)
    write_prn_file(code_lt, small_cfg.bit_len, small_cfg.code_len, 27)
    import dataclasses

    cfg_lt = dataclasses.replace(small_cfg, taps=27)

    x_ns = 40.0  # clock offset to recover
    x_samp = x_ns * 1e-9 * fs  # in samples
    path, d_op, d_lt = 300.0, 50.0, 70.0  # sample delays

    # OP site capture: ch1 = remote (LTFB code), ch2 = loopback (OP code)
    op_re, = synthesize_capture(
        cfg_lt, [ChannelSim(path + x_samp, 40.0, amplitude=1200, noise_sigma=200)],
        n_seconds=2, seed=21)
    op_lo, = synthesize_capture(
        small_cfg, [ChannelSim(d_op, 3.0, amplitude=2500, noise_sigma=100)],
        n_seconds=2, seed=22)
    lt_re, = synthesize_capture(
        small_cfg, [ChannelSim(path - x_samp, -35.0, amplitude=1200, noise_sigma=200)],
        n_seconds=2, seed=23)
    lt_lo, = synthesize_capture(
        cfg_lt, [ChannelSim(d_lt, -2.0, amplitude=2500, noise_sigma=100)],
        n_seconds=2, seed=24)

    cap_op = str(tmp_path / "1755400000_op.bin")
    cap_lt = str(tmp_path / "1755400000_lt.bin")
    io.write_sc16(cap_op, op_re, op_lo)
    io.write_sc16(cap_lt, lt_re, lt_lo)

    proc = ProcessingConfig(df_window_hz=(-2000, 2000))

    def delays_ns(cap, code_remote, code_local, cfg_re, cfg_lo):
        # remote channel (ch1) correlated against the other station's code
        out_re = godual.process_file(
            cap, code_remote, cfg_re, proc, StationConfig(), remote=True,
            batch_epochs=32, dtype=jnp.complex128,
            out_mat=str(tmp_path / "tmp_re.mat"),
            df_window_hz=(-2000, 2000))
        # loopback channel: process as ch2 of the dual layout
        out_full = godual.process_file(
            cap, code_local, cfg_lo, proc, StationConfig(), remote=False,
            batch_epochs=32, dtype=jnp.complex128,
            out_mat=str(tmp_path / "tmp_lo.mat"))
        re = out_re["ch1"]
        lo = out_full["ch2"]
        to_ns = 1e9 / cfg_re.fs / 3.0
        return (
            (re["indice"] + re["correction"]) * to_ns,
            (lo["indice"] + lo["correction"]) * to_ns,
        )

    opre, oplo = delays_ns(cap_op, code_lt, code_op, cfg_lt, small_cfg)
    ltre, ltlo = delays_ns(cap_lt, code_op, code_lt, small_cfg, cfg_lt)

    policy = GatingPolicy(codes_per_second=int(small_cfg.codes_per_second),
                          drop_first=0)
    sol = twoway.solve_session(oplo, opre, ltlo, ltre, 1755400000.0, policy)
    # truth: x + (d_lt - d_op)/2 in samples -> ns
    truth_ns = (x_samp + (d_lt - d_op) / 2.0) / fs * 1e9
    assert abs(sol.res_mean - truth_ns) < 2.0, (sol.res_mean, truth_ns)
    assert sol.res_std < 3.0


def test_gating_policy_for_signal_scaling():
    """GatingPolicy.for_signal: production geometry maps to the default
    constants exactly; other geometries scale the Ts-derived levels."""
    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.models.twoway import GatingPolicy

    prod = GatingPolicy.for_signal(SignalConfig())
    assert prod == GatingPolicy()
    small = SignalConfig(fs=1e5, chip_rate=5e4, code_len=1000, bit_len=10,
                         taps=9)
    p = GatingPolicy.for_signal(small, nint=4)
    ts = 1e9 / small.fs
    assert abs(p.ambiguity_ns - ts / 9) < 1e-9
    assert abs(p.loopback_jump_ns - 2.0 * ts / 200.0) < 1e-9
    assert p.codes_per_second == 50
    assert p.amplitude_ratio == 0.5  # non-Ts levels untouched
    p2 = GatingPolicy.for_signal(small, outlier_ns=7.0)
    assert p2.outlier_ns == 7.0  # overrides win


def test_fold_symmetric_both_sides():
    """Review-r5 regression: both fold masks are computed BEFORE any
    mutation, so mirrored escapes fold symmetrically (the sequential
    version folded a positive escape down and then straight back up)."""
    from amaranth_twstft_tpu.models.twoway import (
        GatingPolicy,
        fold_sample_ambiguity,
    )

    pol = GatingPolicy()
    amb = pol.ambiguity_ns
    base = np.zeros(100)
    up = base.copy()
    up[50] = 30.0
    down = base.copy()
    down[50] = -30.0
    fu = fold_sample_ambiguity(up, pol)
    fd = fold_sample_ambiguity(down, pol)
    assert abs(fu[50] - (30.0 - amb)) < 1e-12, fu[50]
    assert abs(fd[50] - (-30.0 + amb)) < 1e-12, fd[50]
    # untouched bulk stays put
    assert np.all(fu[:50] == 0) and np.all(fd[:50] == 0)


def test_pair_and_solve_daily_no_overlap_returns_not_ok(tmp_path):
    """Review-r5 regression: a pseudo-time offset under the 180 s gate
    but beyond a table's row count returns ok=False, not ValueError."""
    from amaranth_twstft_tpu.models.twoway import pair_and_solve_daily

    def rows(t0, n):
        out = []
        for i in range(n):
            out.append([2023, 3, 15, 10, 0, t0 + i,
                        2e-5, 0.1, 30.0, 2.1e-5, 0.2, 31.0,
                        2.6e-5, 0.3, 29.0])
        return np.asarray(out, dtype=float)

    # op starts 50 pseudo-seconds after lt, but lt has only 10 rows:
    # the lt_rows[50:] slice is empty while diff=50 passes the 180 gate
    out = pair_and_solve_daily(rows(50, 5), rows(0, 10))
    assert out["ok"] is False
    assert "overlap" in out["reason"] or "SNR" in out["reason"]
