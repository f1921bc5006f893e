"""Exhaustive bounded verification — the formal-methods analogue.

The reference ships SymbiYosys BMC/k-induction scaffolding
(``amaranth_twstft/utils.py:29-83``, ``FHDLTestCase.assertFormal``) with
no in-repo specs; the TPU build's equivalent is EXHAUSTIVE state-space
enumeration of the behavioral models at bounded geometry — every seed,
every reset point, every PPS phase, every mixer input combination.  At
these sizes exhaustion IS proof (no sampling), which is exactly the
guarantee a bounded model check provides.
"""

import numpy as np
import pytest

from amaranth_twstft_tpu.config import Modulation, TimeCoderMode
from amaranth_twstft_tpu.models.emitter import timecode_bits
from amaranth_twstft_tpu.models.gateware import (
    GatewareGeometry,
    SafeTimer,
    mixer_out,
    oscillator_waveforms,
    synchronizer_pps_flags,
)
from amaranth_twstft_tpu.ops.lfsr import find_mseq_taps, lfsr_next


def test_lfsr_exhaustive_all_seeds_match_oracle():
    """EVERY nonzero 8-bit seed: the vectorized stepper equals the
    Python-int oracle step-for-step (the ``prn.py:55-96`` testbench's
    oracle pattern, exhausted instead of sampled)."""
    bit_len = 8
    taps = find_mseq_taps(bit_len, 1)[0]
    seeds = np.arange(1, 1 << bit_len, dtype=np.uint64)
    # lockstep walk across all seeds simultaneously
    cur = seeds.copy()
    for step in range(64):
        nxt_oracle = np.array(
            [lfsr_next(int(s), taps, bit_len) for s in cur], dtype=np.uint64
        )
        # vector step: one step from each current state
        msb = np.uint64(1) << np.uint64(bit_len - 1)
        x = cur & np.uint64(taps)
        for sh in (32, 16, 8, 4, 2, 1):
            x = x ^ (x >> np.uint64(sh))
        nxt_vec = (cur >> np.uint64(1)) | ((x & np.uint64(1)) * msb)
        np.testing.assert_array_equal(nxt_vec, nxt_oracle)
        cur = nxt_vec


def test_lfsr_mseq_period_exhaustive():
    """m-sequence taps: from seed 1 the state walk visits ALL 2^n - 1
    nonzero states exactly once before returning (the
    ``tools/mseq_calculator.c:31-38`` criterion as a full proof)."""
    bit_len = 10
    taps = find_mseq_taps(bit_len, 1)[0]
    period = (1 << bit_len) - 1
    seen = np.zeros(1 << bit_len, dtype=bool)
    s = 1
    for _ in range(period):
        assert not seen[s], "state revisited before full period"
        seen[s] = True
        s = lfsr_next(s, taps, bit_len)
        assert s != 0, "zero state reached (absorbing)"
    assert s == 1, "period is not 2^n - 1"
    assert seen[1:].all(), "some nonzero state unreachable"


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 9, 16, 33])
def test_safe_timer_exhaustive_reset_points(n):
    """SafeTimer's ONLY contract (``safe_timer.py:7-50``): `finished`
    rises exactly n ticks after the last reset — verified for every
    reset point within two full periods."""
    for reset_at in range(2 * n):
        t = SafeTimer(n)
        for k in range(reset_at):
            t.step()
        t.step(reset=True)
        for k in range(1, 2 * n + 1):
            fin = t.step()
            assert fin == (k >= n), (n, reset_at, k)


def test_synchronizer_pps_flags_exhaustive():
    """ALL logic-tick PPS arrival phases within one code: the three
    misalignment flags (``synchronizer.py:86-101``) assert exactly when
    the corresponding counter is mid-flight, and the uniquely aligned
    tick raises none."""
    geom = GatewareGeometry(f_clock=112, f_carrier=28, f_code=4)
    # 112/28 = 4 ticks/period, 28/4 = 7 periods/chip, code of 5 chips
    code_len = 5
    ticks_per_code = geom.ticks_per_chip * code_len
    clean = []
    for pps in range(2 * ticks_per_code):
        flags = synchronizer_pps_flags(pps, geom, code_len)
        tpp = geom.ticks_per_period
        assert flags["oscil_unaligned"] == (pps % tpp != tpp - 1)
        period_idx = pps // tpp
        assert flags["symbol_unaligned"] == (
            period_idx % geom.periods_per_symbol
            != geom.periods_per_symbol - 1
        )
        if not any(flags.values()):
            clean.append(pps)
    # exactly one perfectly aligned tick per code period: its last tick
    assert clean == [ticks_per_code - 1, 2 * ticks_per_code - 1]


def test_mixer_truth_table_exhaustive():
    """The full 1-bit mixer truth table (``mixer.py:20-41``): all modes x
    all 2^5 input combinations, against independently written XOR/Gray
    semantics."""
    for mode in Modulation:
        for c in (0, 1):
            for c90 in (0, 1):
                for d0 in (0, 1):
                    for d1 in (0, 1):
                        for tc in (0, 1):
                            out = int(
                                mixer_out(
                                    np.array([c]), np.array([c90]),
                                    np.array([d0]), np.array([d1]),
                                    np.array([tc]), mode,
                                )[0]
                            )
                            if mode == Modulation.OFF:
                                exp = 0
                            elif mode == Modulation.CARRIER:
                                exp = c ^ tc
                            elif mode == Modulation.BPSK:
                                exp = c ^ d0 ^ tc
                            else:  # QPSK Gray: axis by d0^d1
                                axis = c if (d0 ^ d1) else c90
                                exp = d0 ^ axis ^ tc
                            assert out == exp, (mode, c, c90, d0, d1, tc)


def test_timecoder_all_seconds_exhaustive():
    """Every seconds value 0..121: code 0 inverted, codes 1..6 carry the
    6-bit counter LSB-first, minute wrap at 60 (``time_coder.py:25-41``)."""
    for second in range(122):
        bits = timecode_bits(TimeCoderMode.TIMECODE, second, 25)
        assert bits[0] == 1
        val = sum(int(bits[1 + i]) << i for i in range(6))
        assert val == second % 60, (second, val)
        assert not bits[7:].any()
        off = timecode_bits(TimeCoderMode.OFF, second, 25)
        assert not off.any()


def test_oscillator_quadrature_exhaustive():
    """All phases of one period: out/out90 are square waves in exact
    quadrature and phase_end strobes once per period
    (``oscillator.py:19-40``)."""
    for tpp in (4, 8, 12, 28):
        out, out90, pe = oscillator_waveforms(3 * tpp, tpp)
        # duty: high the first half-period
        for k in range(3 * tpp):
            assert out[k] == (k % tpp < tpp // 2)
            assert out90[k] == (tpp // 4 <= k % tpp < (3 * tpp) // 4)
            assert pe[k] == (k % tpp == tpp - 1)
        assert int(pe.sum()) == 3
