"""LFSR / m-sequence tests: JAX vs Python-int oracle vs golden taps."""

import numpy as np

from amaranth_twstft_tpu.config import GOLDEN_TAPS_17
from amaranth_twstft_tpu.ops import lfsr


def test_next_matches_manual():
    # 4-bit, taps 0b1001: parity of bits 0 and 3 feeds the MSB
    s = 0b1011
    out = lfsr.lfsr_next(s, 0b1001, 4)
    bit = (1 ^ 1) & 1  # bits 0 and 3 of s
    assert out == ((s >> 1) | (bit << 3))


def test_jax_matches_python():
    for bit_len, taps in [(7, 3), (10, 9), (17, 9)]:
        n = 500
        py = lfsr.prn_chips(bit_len, taps, n)
        jx = np.asarray(lfsr.prn_chips_jax(bit_len, taps, n))
        np.testing.assert_array_equal(py, jx)


def test_sequence_repeats_beyond_period():
    bit_len, taps = 7, 3
    period = (1 << bit_len) - 1
    assert lfsr.is_mseq(bit_len, taps)
    chips = lfsr.prn_chips(bit_len, taps, 2 * period + 10)
    np.testing.assert_array_equal(chips[:period], chips[period : 2 * period])
    jx = np.asarray(lfsr.prn_chips_jax(bit_len, taps, 2 * period + 10))
    np.testing.assert_array_equal(chips, jx)


def test_golden_17bit_taps():
    # tools/README.md:2-11 lists the known-good 17-bit taps
    assert lfsr.is_mseq(17, GOLDEN_TAPS_17[0])
    assert not lfsr.is_mseq(17, 7)


def test_find_mseq_taps_small():
    taps = lfsr.find_mseq_taps(7, 3)
    assert len(taps) == 3
    for t in taps:
        assert lfsr.is_mseq(7, t)


def test_mseq_balance():
    # an m-sequence of period 2^n - 1 has 2^(n-1) ones
    bit_len, taps = 10, 9
    period = (1 << bit_len) - 1
    chips = lfsr.prn_chips(bit_len, taps, period)
    assert chips.sum() == 1 << (bit_len - 1)


def test_prn_file_roundtrip(tmp_path):
    p = str(tmp_path / "prn.bin")
    lfsr.write_prn_file(p, 10, 3000, 9)
    back = lfsr.read_prn_file(p)
    np.testing.assert_array_equal(back, lfsr.prn_chips(10, 9, 3000))

    q = str(tmp_path / "prnq.bin")
    lfsr.write_prn_file(q, 10, 1000, 9, taps_b=27)
    a, b = lfsr.read_prn_file(q, qpsk=True)
    np.testing.assert_array_equal(a, lfsr.prn_chips(10, 9, 1000))
    np.testing.assert_array_equal(b, lfsr.prn_chips(10, 27, 1000))


def test_taps_cache(tmp_path):
    cache = lfsr.TapsCache(str(tmp_path / "taps.json"))
    taps = cache.autofill(7, 2)
    assert taps == lfsr.find_mseq_taps(7, 2)
    # second call hits the cache (same result, file exists)
    cache2 = lfsr.TapsCache(str(tmp_path / "taps.json"))
    assert cache2.autofill(7, 2) == taps


def test_find_mseq_taps_bit17_golden():
    """Searching bit_len 17 reproduces the reference's known-good taps
    (tools/README.md:2-11, config.GOLDEN_TAPS_17) in seconds — the search
    runs on the native engine (or the NumPy lockstep batch), not the
    per-step Python loop."""
    import time

    from amaranth_twstft_tpu.config import GOLDEN_TAPS_17

    t0 = time.time()
    taps = lfsr.find_mseq_taps(17, len(GOLDEN_TAPS_17))
    assert tuple(taps) == GOLDEN_TAPS_17
    assert time.time() - t0 < 30.0


def test_numpy_search_matches_native_and_oracle():
    from amaranth_twstft_tpu.ops.lfsr import _find_mseq_taps_np, _is_mseq_py

    got = _find_mseq_taps_np(10, 60)
    assert got == lfsr.find_mseq_taps(10, 60)
    # cross-check a few against the pure-Python oracle
    for t in got[:3]:
        assert _is_mseq_py(10, t)
    # taps=6 is verifiably NOT maximal-length for bit_len=10
    assert not _is_mseq_py(10, 6)
    assert 6 not in got


def test_taps_cache_autofill_17(tmp_path):
    from amaranth_twstft_tpu.config import GOLDEN_TAPS_17
    from amaranth_twstft_tpu.ops.lfsr import TapsCache

    cache = TapsCache(str(tmp_path / "taps.json"))
    taps = cache.autofill(17, 4)
    assert tuple(taps) == GOLDEN_TAPS_17[:4]
    # second call is served from the cache file
    cache2 = TapsCache(str(tmp_path / "taps.json"))
    assert cache2.get(17)[:4] == list(GOLDEN_TAPS_17[:4])
