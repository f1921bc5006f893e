"""Cycle-level gateware TX model vs the baseband emitter (models/gateware.py).

Mirrors the reference's embedded testbenches (``oscillator.py:43-74``,
``safe_timer.py:52-70``, ``synchronizer.py:108-164``, ``mixer.py:44-65``)
with the oracle inverted: the 1-bit logic-clock waveform must demodulate to
exactly the baseband model the rest of the framework is built on.
"""

import numpy as np
import pytest

from amaranth_twstft_tpu.config import Modulation, SignalConfig, TimeCoderMode
from amaranth_twstft_tpu.models.emitter import baseband_second
from amaranth_twstft_tpu.models.gateware import (
    GatewareGeometry,
    SafeTimer,
    digital_if_second,
    downconvert_if,
    mixer_out,
    oscillator_waveforms,
    synchronizer_pps_flags,
)
from amaranth_twstft_tpu.ops.nco import make_cosine_lut, nco_spur_floor, nco_wave

# Scaled production geometry: same ratios (28 carrier periods/chip,
# 4 ticks/period, 2 samples/chip), 100-chip code.
CFG = SignalConfig(
    fs=5e4, chip_rate=2.5e4, code_len=100, bit_len=10, taps=9, f_carrier=70e4
)
GEOM = GatewareGeometry(f_clock=2.8e6, f_carrier=70e4, f_code=2.5e4)


def test_geometry_ratios():
    assert GEOM.ticks_per_period == 4
    assert GEOM.periods_per_symbol == 28
    assert GEOM.ticks_per_chip == 112
    prod = GatewareGeometry()  # 280 MHz / 70 MHz / 2.5 Mchip
    assert (prod.ticks_per_period, prod.periods_per_symbol) == (4, 28)


def test_oscillator_invariants():
    t = 8
    out, out90, phase_end = oscillator_waveforms(4 * t, t)
    # 50% duty, high first (oscillator.py:30-32)
    assert out[:4].all() and not out[4:8].any()
    # out90 lags by a quarter period
    assert np.array_equal(out90, np.roll(out, t // 4))
    # phase_end strobes once per period, on the last tick
    assert np.array_equal(np.flatnonzero(phase_end), np.arange(t - 1, 4 * t, t))


def test_safe_timer_exact_n_ticks():
    timer = SafeTimer(37)
    timer.step(reset=True)
    for i in range(36):
        assert not timer.step(), f"finished early at tick {i + 1}"
    assert timer.step()  # exactly n=37 ticks after reset
    assert timer.step()  # stays finished
    timer.step(reset=True)
    assert not timer.finished
    with pytest.raises(ValueError):
        SafeTimer(0)


def test_synchronizer_pps_flags():
    code_ticks = CFG.code_len * GEOM.ticks_per_chip
    # perfectly timed PPS: last tick of the last chip of a code
    aligned = synchronizer_pps_flags(3 * code_ticks - 1, GEOM, CFG.code_len)
    assert not any(aligned.values())
    # one tick late: every counter is mid-flight
    late = synchronizer_pps_flags(3 * code_ticks, GEOM, CFG.code_len)
    assert all(late.values())
    # end of first carrier period: oscillator aligned, chip/code not
    f = synchronizer_pps_flags(GEOM.ticks_per_period - 1, GEOM, CFG.code_len)
    assert not f["oscil_unaligned"]
    assert f["symbol_unaligned"] and f["code_unaligned"]


def test_mixer_modes():
    c = np.array([0, 1, 0, 1], dtype=np.uint8)
    c90 = np.array([0, 0, 1, 1], dtype=np.uint8)
    d0 = np.array([1, 1, 0, 0], dtype=np.uint8)
    z = np.zeros(4, dtype=np.uint8)
    assert not mixer_out(c, c90, d0, z, z, Modulation.OFF).any()
    assert np.array_equal(mixer_out(c, c90, d0, z, z, Modulation.CARRIER), c)
    assert np.array_equal(mixer_out(c, c90, d0, z, z, Modulation.BPSK), c ^ d0)
    # timecode bit XORs the output (mixer.py:36-37)
    tc = np.array([1, 0, 1, 0], dtype=np.uint8)
    assert np.array_equal(mixer_out(c, c90, d0, z, tc, Modulation.BPSK), c ^ d0 ^ tc)


def test_bpsk_if_demodulates_to_chips():
    bits = digital_if_second(CFG, GEOM, n_codes=2)
    assert bits.dtype == np.uint8 and len(bits) == 2 * 100 * 112
    env = downconvert_if(bits, GEOM)  # one sample per chip
    rel = env / env[0]
    # averaging over whole carrier periods is exact: the envelope is a
    # constant times the +/-1 chip sequence
    from amaranth_twstft_tpu.ops.lfsr import prn_chips

    chips = prn_chips(CFG.bit_len, CFG.taps, CFG.code_len, CFG.seed)
    pm = 1.0 - 2.0 * np.tile(chips, 2)
    np.testing.assert_allclose(rel, pm * pm[0], atol=1e-9)
    # amplitude of the 4-tick-sampled square's fundamental: sqrt(2)/2
    # (discrete DFT bin, not the continuous-square 2/pi)
    assert abs(abs(env[0]) - np.sqrt(2) / 2) < 1e-9


def test_bpsk_if_matches_baseband_model():
    bits = digital_if_second(CFG, GEOM, n_codes=2)
    decim = int(GEOM.f_clock / CFG.fs)  # 56 ticks -> fs samples
    env = downconvert_if(bits, GEOM, decim=decim)
    ref = np.tile(baseband_second(CFG)[: CFG.samples_per_code], 2)
    corr = np.vdot(ref, env) / (np.linalg.norm(ref) * np.linalg.norm(env))
    assert abs(corr) > 0.999999


def test_qpsk_if_matches_gray_map():
    cfg = SignalConfig(
        fs=5e4, chip_rate=2.5e4, code_len=100, bit_len=10, taps=9,
        taps_b=17, f_carrier=70e4, modulation=Modulation.QPSK,
    )
    bits = digital_if_second(cfg, GEOM, n_codes=3)
    env = downconvert_if(bits, GEOM)  # per chip
    ref = baseband_second(cfg)[:: cfg.samples_per_chip][: 3 * cfg.code_len]
    ref = np.tile(ref[: cfg.code_len], 3) if len(ref) < 3 * cfg.code_len else ref
    np.testing.assert_allclose(env / env[0], ref / ref[0], atol=1e-6)


def test_timecode_inverts_first_code():
    cfg_tc = SignalConfig(
        fs=5e4, chip_rate=2.5e4, code_len=100, bit_len=10, taps=9,
        f_carrier=70e4, timecoder=TimeCoderMode.INVERT_FIRST_CODE,
    )
    env_tc = downconvert_if(digital_if_second(cfg_tc, GEOM, n_codes=2), GEOM)
    env = downconvert_if(digital_if_second(CFG, GEOM, n_codes=2), GEOM)
    n = CFG.code_len
    np.testing.assert_allclose(env_tc[:n], -env[:n], atol=1e-9)
    np.testing.assert_allclose(env_tc[n:], env[n:], atol=1e-9)


def test_nco_lut_and_spurs():
    lut = make_cosine_lut(8)
    assert lut[0] == 255 and lut.min() == 0 and len(lut) == 256
    # programmed frequency lands on the right FFT bin
    fs, f0, n = 2_000_000.0, 262.0 * 32, 1 << 14
    x = nco_wave(fs, f0, n, resol=8).astype(np.float64)
    x -= x.mean()
    k = np.argmax(np.abs(np.fft.rfft(x * np.hanning(n))))
    assert abs(k * fs / n - f0) < 2 * fs / n
    # phase-truncation spurs below the -6 dB/bit design line (with margin)
    assert nco_spur_floor(fs, f0, n, resol=8) < -40.0
