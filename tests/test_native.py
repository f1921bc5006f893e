"""Native C++ components vs their NumPy/Python counterparts."""

import os

import numpy as np
import pytest
import scipy.io as sio

from amaranth_twstft_tpu import native
from amaranth_twstft_tpu.ops import lfsr
from amaranth_twstft_tpu.utils import io

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="no C++ toolchain"
)


def test_mseq_matches_python():
    assert native.is_mseq(17, 9) and not native.is_mseq(17, 7)
    assert native.find_mseq(10, 4) == lfsr.find_mseq_taps(10, 4)


def test_prn_chips_match():
    np.testing.assert_array_equal(
        native.prn_chips(17, 9, 5000), lfsr.prn_chips(17, 9, 5000)
    )


def test_ingest_matches_numpy(tmp_path, rng):
    n = 50_000
    ch1 = (rng.normal(0, 1000, n) + 1j * rng.normal(0, 1000, n)).astype(
        np.complex64
    )
    ch2 = (rng.normal(0, 500, n) + 1j * rng.normal(0, 500, n)).astype(
        np.complex64
    )
    p = str(tmp_path / "cap.bin")
    io.write_sc16(p, ch1, ch2)

    assert native.file_frames(p, 2) == n
    out, got = native.ingest_epochs(p, 100, 3, 10_000, channels=2)
    assert got == 3 and out.shape == (2, 3, 10_000, 2)
    ref, _ = io.read_sc16_epochs(p, 100, 3, 10_000, channels=2)
    np.testing.assert_array_equal(out[..., 0], ref.real.astype(np.float32))
    np.testing.assert_array_equal(out[..., 1], ref.imag.astype(np.float32))

    dec = native.ingest_decimated(p, 7, channels=2)
    ref_dec = io.decimate_sc16(p, 7, channels=2)
    np.testing.assert_array_equal(dec[..., 0], ref_dec.real.astype(np.float32))

    # short read at EOF
    out2, got2 = native.ingest_epochs(p, n - 5_000, 3, 10_000)
    assert got2 == 0
    # mtime recovery (stat.c role)
    assert abs(native.file_mtime(p) - os.path.getmtime(p)) < 1.0


def test_write_sc16_roundtrip(tmp_path, rng):
    n = 10_000
    ri = rng.normal(0, 1000, (n, 2)).astype(np.float32)
    p = str(tmp_path / "w.bin")
    assert native.write_sc16(p, ri) == n
    back, got = native.ingest_epochs(p, 0, 1, n, channels=1)
    assert got == 1
    np.testing.assert_array_equal(back[0, 0], np.rint(ri).astype(np.float32))


def test_native_mat_writer_scipy_readable(tmp_path, rng):
    """The C++ MAT v5 writer's files load via scipy and Octave-compatible
    field names (the GoRanging::save contract)."""
    p = str(tmp_path / "out.mat")
    corr = rng.normal(0, 1, 100)
    snr = rng.normal(10, 1, 100)
    xval = rng.normal(0, 1, 100) + 1j * rng.normal(0, 1, 100)
    native.save_mat(p, {"correction1": corr, "SNR1": snr, "xval1": xval})
    md = sio.loadmat(p)
    np.testing.assert_allclose(md["correction1"].ravel(), corr)
    np.testing.assert_allclose(md["SNR1"].ravel(), snr)
    np.testing.assert_allclose(md["xval1"].ravel(), xval)
    assert md["correction1"].shape == (100, 1)  # column vector like matio


def test_native_mat_reload_through_loader(tmp_path, rng):
    """matio.load_result auto-detects the C convention on native files."""
    from amaranth_twstft_tpu.utils import matio

    p = str(tmp_path / "resC.mat")
    native.save_mat(
        p,
        {
            "correction1": np.arange(10.0) + 500,
            "SNR1": np.full(10, 12.0),
            "df1": np.full(10, 100.0),
            "xval1": np.ones(10, complex),
        },
    )
    back = matio.load_result(p)
    np.testing.assert_allclose(back["solution1"], np.arange(10.0) + 500)
    np.testing.assert_allclose(back["snr1_db"], 12.0)


def test_q8_reader_roundtrip_and_select(tmp_path, rng, monkeypatch):
    """int8 epoch reader: exact-scale quantization reconstructs the int16
    samples to half a step, and select=c extracts exactly channel c's
    I/Q columns (the remote-mode transfer format)."""
    from amaranth_twstft_tpu.utils import io

    L, n = 500, 6
    raw = rng.integers(-1800, 1800, (n * L, 4)).astype(np.int16)
    # full-scale sentinels: a clipped/near-saturated capture forces the
    # pow2 path to sh=9, half=256, where an int16 rounding add would wrap
    # (io.py TWSTFT_Q8_POW2 path) — the half-step bound below catches it
    raw[0, 0] = 32767
    raw[0, 1] = -32768
    raw[1, 0] = 32700
    raw[1, 1] = -32700
    p = str(tmp_path / "q8.bin")
    raw.tofile(p)

    monkeypatch.delenv("TWSTFT_Q8_POW2", raising=False)
    smax = max(int(raw.max()), -int(raw.min()))  # abs() wraps on -32768
    q, m, scale = io.read_sc16_epochs_q8(p, 0, n, L, channels=2)
    assert m == n and q.shape == (n, L, 4) and q.dtype == np.int8
    back = q.reshape(n * L, 4).astype(np.float64) * scale
    assert np.abs(back - raw).max() <= 0.5 * scale + 1e-9
    # scale is the exact max|x|/127 contract (PARITY deviation 10)
    assert abs(scale - max(smax, 1) / 127.0) < 1e-12

    # TWSTFT_Q8_POW2=1: integer-shift path, power-of-2 scale, same
    # half-step reconstruction bound
    monkeypatch.setenv("TWSTFT_Q8_POW2", "1")
    q2, m2p, s2 = io.read_sc16_epochs_q8(p, 0, n, L, channels=2)
    assert m2p == n
    assert s2 == 2.0 ** round(np.log2(s2))  # exact power of two
    back2 = q2.reshape(n * L, 4).astype(np.float64) * s2
    assert np.abs(back2 - raw).max() <= 0.5 * s2 + 1e-9
    assert s2 < 2 * max(smax, 1) / 127.0  # <=2x exact step
    monkeypatch.delenv("TWSTFT_Q8_POW2")

    for sel in (0, 1):
        qs, ms, ss = io.read_sc16_epochs_q8(p, 0, n, L, channels=2,
                                            select=sel)
        assert ms == n and qs.shape == (n, L, 2)
        cols = raw[:, 2 * sel : 2 * sel + 2]
        backs = qs.reshape(n * L, 2).astype(np.float64) * ss
        assert np.abs(backs - cols).max() <= 0.5 * ss + 1e-9
        # per-selection scale: quantized over the selected columns only
        assert abs(ss - max(max(int(cols.max()), -int(cols.min())), 1) / 127.0) < 1e-12

    # short tail and empty file behave like the other readers
    q2, m2, _ = io.read_sc16_epochs_q8(p, (n - 1) * L + 3, 5, L, channels=2)
    assert m2 == 0 and q2.shape[0] == 0


def test_native_quantizer_bitexact_vs_python(tmp_path, rng, monkeypatch):
    """twstft_quantize_q8 (threaded C++, the host-convert term of the
    v5e-16 model) is bit-for-bit identical to the Python q8 paths in
    every mode (exact/pow2 x all-channels/select), including at int16
    full scale."""
    L, n = 4096, 7
    raw = rng.integers(-1800, 1800, (n * L, 4)).astype(np.int16)
    raw[0, :2] = (32767, -32768)
    raw[1, :2] = (32700, -32700)
    p = str(tmp_path / "qn.bin")
    raw.tofile(p)

    for pow2 in (False, True):
        if pow2:
            monkeypatch.setenv("TWSTFT_Q8_POW2", "1")
        else:
            monkeypatch.delenv("TWSTFT_Q8_POW2", raising=False)
        for sel in (None, 0, 1):
            monkeypatch.setenv("TWSTFT_Q8_NATIVE", "0")
            qp, mp, sp = io.read_sc16_epochs_q8(
                p, L, n - 1, L, channels=2, select=sel
            )
            monkeypatch.setenv("TWSTFT_Q8_NATIVE", "1")
            qn, mn, sn = io.read_sc16_epochs_q8(
                p, L, n - 1, L, channels=2, select=sel
            )
            assert mp == mn == n - 1
            assert sp == sn, (pow2, sel, sp, sn)
            np.testing.assert_array_equal(qp, qn)


def test_native_quantizer_fused_decimation(tmp_path, rng):
    """decim>0 emits every decim-th frame as float32 alongside the int8
    output — the df pre-pass read fused into the quantize pass (one
    pass over the capture instead of two)."""
    n = 10_000
    raw = rng.integers(-3000, 3000, (n, 4)).astype(np.int16)
    p = str(tmp_path / "qd.bin")
    raw.tofile(p)
    q, m, scale, dec = native.quantize_q8(p, 0, n, channels=2, decim=25)
    assert m == n
    np.testing.assert_array_equal(dec, raw[::25].astype(np.float32))
    # and with a start offset, decimation is relative to start_frame
    q2, m2, _, dec2 = native.quantize_q8(p, 40, n - 40, channels=2, decim=7)
    np.testing.assert_array_equal(dec2, raw[40::7].astype(np.float32))


def test_raw16_reader(tmp_path, rng):
    """read_raw16 / read_sc16_epochs_raw16: verbatim int16 frames (the
    sc16 ship-the-wire-format ingest), with select and short tails."""
    L, n = 1000, 5
    raw = rng.integers(-32768, 32768, (n * L, 4)).astype(np.int16)
    p = str(tmp_path / "r16.bin")
    raw.tofile(p)
    a, m = native.read_raw16(p, 2 * L, 2 * L, channels=2)
    assert m == 2 * L
    np.testing.assert_array_equal(a, raw[2 * L : 4 * L])
    a1, m1 = native.read_raw16(p, 0, L, channels=2, select=1)
    np.testing.assert_array_equal(a1, raw[:L, 2:4])

    e, ne = io.read_sc16_epochs_raw16(p, 0, 10, L, channels=2)
    assert ne == n and e.shape == (n, L, 4) and e.dtype == np.int16
    np.testing.assert_array_equal(e.reshape(-1, 4), raw)
    e2, ne2 = io.read_sc16_epochs_raw16(p, n * L - 3, 2, L, channels=2)
    assert ne2 == 0 and e2.shape[0] == 0
