"""CLI emit + monitor (streaming follow) round trip on a synthetic capture."""

import numpy as np

from amaranth_twstft_tpu import cli
from amaranth_twstft_tpu.pipeline import follow_capture


def _sig_args(cfg):
    return [
        "--fs", str(cfg.fs), "--chip-rate", str(cfg.chip_rate),
        "--code-len", str(cfg.code_len), "--bitlen", str(cfg.bit_len),
        "--taps", str(cfg.taps),
    ]


def test_emit_then_monitor_once(small_cfg, tmp_path, capsys):
    cfg = small_cfg
    cap = str(tmp_path / "cap.bin")
    code = str(tmp_path / "code.bin")
    rc = cli.main(
        ["prn", "--bitlen", str(cfg.bit_len), "--noiselen", str(cfg.code_len),
         "--taps", str(cfg.taps), "-o", code]
    )
    assert rc == 0
    rc = cli.main(
        ["emit", cap, *_sig_args(cfg), "--seconds", "1",
         "--delay", "437", "--doppler", "120", "--amplitude", "900",
         "--noise", "150", "--delay2", "12", "--doppler2", "5"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(
        ["monitor", cap, code, *_sig_args(cfg), "--channels", "2",
         "--epochs", "10", "--once"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [line.split() for line in out if not line.startswith("#")]
    assert len(rows) > 0
    ch0 = np.array([float(r[2]) for r in rows if r[1] == "0"])
    # known ground truth: 437 samples
    assert np.all(np.abs(ch0 - 437.0) < 0.5), ch0


def test_follow_capture_incremental(small_cfg, tmp_path):
    """follow_capture yields batches as the file grows (tail semantics)."""
    cfg = small_cfg
    L = cfg.samples_per_code
    path = str(tmp_path / "grow.bin")
    rng = np.random.default_rng(0)

    def chunk(n):
        z = (rng.normal(0, 100, n) + 1j * rng.normal(0, 100, n))
        out = np.empty(2 * n, np.int16)
        out[0::2] = np.real(z).astype(np.int16)
        out[1::2] = np.imag(z).astype(np.int16)
        return out.tobytes()

    with open(path, "wb") as f:
        f.write(chunk(3 * L))  # 3 epochs available
        f.flush()
        gen = follow_capture(
            path, cfg, channels=1, epochs_per_batch=2, stop_when_idle=True
        )
        got = [next(gen)]
        # grow the file: 2 more epochs -> a second batch becomes complete
        f.write(chunk(2 * L))
        f.flush()
        got.extend(list(gen))
    starts = [(e, ch) for e, ch, _ in got]
    assert starts == [(0, 0), (2, 0)]
    assert all(d.shape == (2, L) for _, _, d in got)
