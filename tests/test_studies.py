"""Estimator-behavior studies reproduce the reference's documented
conclusions (experiments/221127_SNR/README.md, SURVEY.md §4.4)."""

import numpy as np

from amaranth_twstft_tpu.ops.lfsr import prn_chips
from amaranth_twstft_tpu.ops.prn import chips_to_pm1
from amaranth_twstft_tpu.studies import (
    interpolation_effect,
    snr_estimator_sweep,
)
from amaranth_twstft_tpu.models.twoway import cn0_dbhz


def _code():
    return chips_to_pm1(prn_chips(12, 0x53, 4000))


def test_despreading_tracks_truth():
    code = _code()
    snr_true = np.logspace(-1.5, 1.5, 13)
    out = snr_estimator_sweep(code, snr_true, seed=2)
    # the despreading estimator tracks theory within ~1.5 dB everywhere
    err = out["claudio_db"] - out["snr_th_db"]
    assert np.max(np.abs(err)) < 1.5, err


def test_xcorr_estimator_saturates_at_high_snr():
    """Code self-noise hides the additive noise at high SNR
    (experiments/221127_SNR/README.md:20-24): the xcorr estimate's slope
    collapses while the despreading estimate keeps rising."""
    code = _code()
    snr_true = np.array([1.0, 10.0, 100.0, 1000.0])
    out = snr_estimator_sweep(code, snr_true, seed=4)
    xc = out["xcorr_db"]
    cl = out["claudio_db"]
    assert cl[-1] - cl[0] > 25  # despreading keeps tracking (30 dB span)
    assert xc[-1] - xc[0] < 15  # xcorr saturates


def test_interpolation_invariance():
    """Despreading SNR is invariant under code ZOH interpolation
    (interpolation_effect.m sweep)."""
    code = _code()[:1000]
    base = interpolation_effect(code, factors=(0.1, 1.0, 10.0), interp_code=1)
    interp3 = interpolation_effect(code, factors=(0.1, 1.0, 10.0), interp_code=3)
    # identical noise realization lengths differ; compare against theory
    for out in (base, interp3):
        err = 10 * np.log10(out["snr_claudio"] / out["snr_th"])
        assert np.max(np.abs(err)) < 1.0, err


def test_cn0_operating_point():
    """C/N0 = 10log10(SNR*fs): the documented SATRE-like point, SNR=-13 dB
    in fs=5 MHz -> ~54 dB.Hz (simu_snr.m:1-7, go_1s.m:124)."""
    snr_lin = 10 ** (-13 / 10)
    got = cn0_dbhz(np.full(5, snr_lin), np.zeros(5), 5e6)
    assert abs(got - (10 * np.log10(snr_lin * 5e6))) < 1e-9
    assert 53.0 < got < 55.0


def test_qpsk_does_not_improve_timing(small_cfg):
    """Reproduces the 220822 campaign conclusion: QPSK at equal total
    power times no better than BPSK (each code is 3 dB down)."""
    from amaranth_twstft_tpu.studies import qpsk_vs_bpsk_study

    r = qpsk_vs_bpsk_study(small_cfg)
    # both recover the injected 137.25-sample delay
    assert abs(r["bpsk_mean"] - 137.25) < 0.1, r
    assert abs(r["qpsk_mean"] - 137.25) < 0.2, r
    # and QPSK is no more precise than BPSK
    assert r["qpsk_std_samples"] > 0.8 * r["bpsk_std_samples"], r


def test_slip_repair_study():
    """240527 campaign: the corrige policy recovers the pre-slip noise
    floor (go.m:53-59)."""
    from amaranth_twstft_tpu.studies import slip_repair_study

    out = slip_repair_study()
    assert out["n_flagged"] >= 20  # the slip excursion flags
    assert out["std_repaired"] < 0.1 * out["std_raw"]
    assert out["std_repaired"] < 0.05


def test_code_length_study_sqrt_scaling():
    """221207 campaign: delay std scales ~1/sqrt(code_len) at fixed chip
    rate and per-sample SNR (README.md:10-19; lengths scaled down 16x)."""
    from amaranth_twstft_tpu.studies import code_length_study

    out = code_length_study()
    # every configuration recovers the injected 123-sample delay
    assert np.all(np.abs(out["mean_samples"] - 123.0) < 0.5), out
    # precision improves monotonically with code length ...
    assert out["std_samples"][0] > out["std_samples"][1] > out["std_samples"][2]
    # ... following the matched-filter 1/sqrt(N) law (16x length -> 4x
    # std, within estimation noise of 48 epochs)
    ratio = out["std_samples"][0] / out["std_samples"][2]
    assert 2.0 < ratio < 8.0, out


def test_campaign_geometries_are_expressible():
    """All seven 221207 bitstream configurations (incl. the 230111
    one-second 2.5 Mchip code) are valid SignalConfigs with the right
    derived cadence."""
    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.studies import CODE_LENGTH_CAMPAIGN

    for bit_len, taps, code_len in CODE_LENGTH_CAMPAIGN:
        cfg = SignalConfig(code_len=code_len, bit_len=bit_len, taps=taps)
        assert cfg.samples_per_code == 2 * code_len
        assert code_len < 2**bit_len  # truncation of the m-sequence
    one_s = SignalConfig(code_len=2_500_000, bit_len=22, taps=3)
    assert one_s.codes_per_second == 1.0
    assert one_s.code_duration == 1.0


def test_timing_interpolation_mandatory():
    """220830 campaign conclusion: Nint>0 is mandatory for timing (no
    interpolation inflates the delay std ~15x), Nint>1 adds nothing
    (analysis.m summary table)."""
    from amaranth_twstft_tpu.studies import timing_interpolation_study

    out = timing_interpolation_study()
    s0, s1, s2 = out["std_samples"]
    assert s0 > 5.0 * s1, out  # no interpolation = fluctuations
    assert s2 < 2.0 * s1, out  # Nint=2 is not better than Nint=1
    assert s1 < 0.05, out  # interpolated timing is sub-1/20-sample


def test_analyse_satre_outlier_policy():
    """analysis.m:9-21: quadratic detrend, NaN |r|>10 ns plus both
    neighbors, drop; continuous series smoothed 250 and decimated."""
    from amaranth_twstft_tpu.studies import analyse_satre_series

    rng = np.random.default_rng(5)
    x = 1e-9 * rng.normal(0, 0.3, 2000) + 5e-9 * np.arange(2000) ** 2 / 2000**2
    x[700] += 50e-9  # outlier
    out = analyse_satre_series(x)
    assert not out["kept"][699] and not out["kept"][700] and not out["kept"][701]
    assert out["kept"].sum() == 1997
    assert out["std"] < 1e-9
    cont = analyse_satre_series(x, continuous=True)
    # 250-point mean + decimate-by-250: ~2000/250 points survive
    assert 4 <= len(cont["clean"]) <= 9
    assert cont["std"] < out["std"]


def test_f16_ingest_error_subpicosecond():
    """The f16-ingest fast path's delay error vs the float64 oracle is
    sub-picosecond at the -13 dB operating point (PARITY deviation 10;
    full 1024-epoch percentile table measured by the same study)."""
    from amaranth_twstft_tpu.studies import f16_ingest_error_study

    res = f16_ingest_error_study(n_epochs=64, chunk=32)
    # 0.1 ns budget with two orders of magnitude of margin
    assert res["quant"]["max_ns"] < 0.01, res["quant"]
    assert res["f32"]["max_ns"] < 0.01, res["f32"]
    # int8 (half-byte transfer): inside the 0.1 ns budget
    assert res["int8"]["max_ns"] < 0.1, res["int8"]
    assert res["f32"]["n"] == 64


def test_gotracking_slope_noise_floor():
    """Loopback carrier-slope study (gotracking_inv2.m): the refinement
    loop recovers an injected 3e-12 s/s delay drift and the 1 s slope
    noise floor lands in the 1e-13 s/s decade the 230503 campaign
    measured (experiments/230503_100kchips_withcode/README.md:3)."""
    from amaranth_twstft_tpu.studies import gotracking_slope_study

    out = gotracking_slope_study(n_seconds=12, seed=1)
    floor = out["noise_floor_s_per_s"]
    assert floor < 1e-12, floor  # loopback-SNR decade at study L
    # injected drift recovered within 3 sigma of the floor
    n = len(out["slopes_s_per_s"])
    assert (abs(out["slope_mean"] - out["slope_true"])
            < 3 * floor / np.sqrt(n)), out
    # production-L extrapolation sits at the campaign's ~1e-13 order
    assert out["floor_production_extrapolated"] < 3e-13


def test_nco_tutorial_halving_quirk_and_exact_mode():
    """The tutorial NCO's unit/accumulator width mismatch halves the
    output frequency whenever frac(log2 tick_freq) < 0.5 (NCO.py:12-15;
    at the production 280 MHz tick the gateware itself emits f/2) —
    reproduced bit-faithfully, with exact=True as the corrected design."""
    from amaranth_twstft_tpu.ops.nco import nco_wave

    def peak_hz(wave, fs):
        x = wave.astype(float) - wave.mean()
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.argmax(spec) * fs / len(x)

    fs, f0, n = 280e6, 4.375e6, 1 << 14
    assert abs(peak_hz(nco_wave(fs, f0, n), fs) - f0 / 2) < fs / n
    assert abs(peak_hz(nco_wave(fs, f0, n, exact=True), fs) - f0) < fs / n
    # the tutorial's own tick rate (frac(log2 F)=0.93): both agree
    fs2, f02 = 2e6, 125e3
    assert abs(peak_hz(nco_wave(fs2, f02, n), fs2) - f02) < fs2 / n
    assert abs(peak_hz(nco_wave(fs2, f02, n, exact=True), fs2) - f02) < fs2 / n
