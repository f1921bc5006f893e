"""Acquisition recorder: the b210_file.py flowgraph stages in software.

Reference graph (``processing/Python/b210_file.py:38-78``): 2-ch fc32 ->
interleave -> x32767 -> complex_to_interleaved_short ->
head(fs*duree*2*2 shorts) -> file.
"""

import io
import os
import socket
import threading

import numpy as np

from amaranth_twstft_tpu import cli
from amaranth_twstft_tpu.utils import io as uio
from amaranth_twstft_tpu.utils.recorder import record_fc32_stream


def _fc32_stream(z_ch):
    """Channels (c, n) complex64 -> interleaved fc32 bytes."""
    inter = np.empty(z_ch.shape[1] * z_ch.shape[0], np.complex64)
    for c in range(z_ch.shape[0]):
        inter[c::z_ch.shape[0]] = z_ch[c]
    return inter.tobytes()


def test_record_scales_saturates_and_heads(tmp_path, rng):
    fs, n = 1000.0, 2500
    z = (rng.normal(0, 0.02, (2, n)) + 1j * rng.normal(0, 0.02, (2, n))
         ).astype(np.complex64)
    z[0, 5] = 1.5 + 1.5j  # beyond full scale: must saturate
    out = str(tmp_path / "cap.bin")
    # head bound: 2 s = 2000 frames < the 2500 streamed
    got = record_fc32_stream(
        io.BytesIO(_fc32_stream(z)), out, fs, 2.0, chunk_frames=300
    )
    assert got == 2000
    mm = uio.open_sc16(out, channels=2)
    assert mm.shape == (2000, 4)
    exp = np.clip(np.rint(z[0, :2000].real * 32767), -32768, 32767)
    np.testing.assert_array_equal(mm[:, 0], exp.astype(np.int16))
    assert mm[5, 0] == 32767 and mm[5, 1] == 32767  # saturated
    exp1 = np.clip(np.rint(z[1, :2000].imag * 32767), -32768, 32767)
    np.testing.assert_array_equal(mm[:, 3], exp1.astype(np.int16))

    # EOF before the head bound: short capture, partial frame dropped
    out2 = str(tmp_path / "cap2.bin")
    buf = _fc32_stream(z[:, :100]) + b"\x00" * 7  # 7 stray bytes
    got2 = record_fc32_stream(io.BytesIO(buf), out2, fs, 10.0)
    assert got2 == 100
    assert os.path.getsize(out2) == 100 * 8


def test_acquire_cli_over_tcp(tmp_path, rng):
    """twstft-tpu acquire --from tcp:... records a socket stream (the
    X310 10GbE capture-link role) and the result round-trips through
    the standard ingest."""
    fs, n = 1000.0, 1500
    z = (0.03 * rng.normal(size=(2, n)) + 0.03j * rng.normal(size=(2, n))
         ).astype(np.complex64)
    payload = _fc32_stream(z)

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feeder():
        conn, _ = srv.accept()
        conn.sendall(payload)
        conn.close()

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    out = str(tmp_path / "tcp.bin")
    rc = cli.main([
        "acquire", out, "--from", f"tcp:127.0.0.1:{port}",
        "--fs", str(fs), "--seconds", "1.2",
    ])
    th.join(timeout=10)
    srv.close()
    assert rc == 0
    assert uio.n_samples_sc16(out, channels=2) == 1200  # head bound
    d, got = uio.read_sc16_epochs(out, 0, 1, 1200, channels=2)
    assert got == 1
    np.testing.assert_allclose(
        d[0, 0].real, np.rint(z[0, :1200].real * 32767), atol=0.5
    )
