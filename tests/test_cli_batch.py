"""CLI entry points + directory batch orchestration end-to-end."""

import json
import os

import numpy as np
import pytest

from amaranth_twstft_tpu import cli, pipeline
from amaranth_twstft_tpu.config import ProcessingConfig
from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops.lfsr import write_prn_file
from amaranth_twstft_tpu.utils import io


@pytest.fixture(scope="module")
def workdir(small_cfg, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("batch")
    code = str(tmp / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    for i, (delay, dopp) in enumerate([(50.0, 100.0), (75.0, -150.0)]):
        (s,) = synthesize_capture(
            small_cfg,
            [ChannelSim(delay, dopp, amplitude=1500, noise_sigma=150)],
            n_seconds=1,
            seed=30 + i,
        )
        io.write_sc16(str(tmp / f"175540000{i}_2.bin"), s)
    return tmp, code


def test_batch_claudio(small_cfg, workdir):
    tmp, code = workdir
    proc = ProcessingConfig(conjugate_data=True, block_seconds=0.5,
                            skip_seconds=0.0)
    rep = pipeline.process_directory(
        str(tmp), code, small_cfg, proc, chain="claudio",
        gzip_outputs=True, move_done=True,
    )
    assert len(rep.processed) == 2 and not rep.failed, rep.failed
    # outputs gzipped, inputs moved to donetw/
    outs = [f for f in os.listdir(tmp) if f.endswith(".mat.gz")]
    assert len(outs) == 2
    assert len(os.listdir(tmp / "donetw")) == 2
    # idempotent second pass: nothing to do
    rep2 = pipeline.process_directory(
        str(tmp), code, small_cfg, proc, chain="claudio"
    )
    assert not rep2.processed and not rep2.failed


def test_cli_prn_and_ranging(small_cfg, tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # prn generation via CLI
    rc = cli.main(["prn", "--bitlen", "10", "--noiselen", "1000",
                   "--taps", "9", "-o", "code.bin"])
    assert rc == 0
    assert os.path.getsize("code.bin") == 1000

    io.write_sc16("1755400002.bin", *synthesize_capture(
        small_cfg,
        [ChannelSim(40.0, 50.0, amplitude=1500, noise_sigma=150),
         ChannelSim(10.0, 5.0, amplitude=2500, noise_sigma=100)],
        n_seconds=1, seed=2,
    ))
    rc = cli.main([
        "ranging", "1755400002.bin", "code.bin",
        "--fs", "1e5", "--chip-rate", "5e4", "--code-len", "1000",
        "--bitlen", "10", "--taps", "9", "--f64",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.endswith(".mat") and os.path.exists(out)


def test_cli_config_roundtrip(tmp_path, capsys):
    rc = cli.main(["config"])
    assert rc == 0
    text = capsys.readouterr().out
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(text)
    rc = cli.main(["config", "--load", str(cfg_file)])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["signal"]["fs"] == 5e6


def test_overlapped_matches_goranging(small_cfg, tmp_path):
    """process_capture_overlapped (fused dual-channel step + prefetch
    pipeline) reproduces goranging.process_file's solutions exactly."""
    import numpy as np
    import jax.numpy as jnp

    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models import goranging
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.utils import io

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2,
        seed=5,
    )
    cap = str(tmp_path / "1755400000.bin")
    io.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True, df_decimation=5)

    base = goranging.process_file(
        cap, code, small_cfg, proc, batch_epochs=16,
        out_mat=str(tmp_path / "base.mat"),
    )
    fast = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=16,
        out_mat=str(tmp_path / "fast.mat"),
    )
    assert fast["df"] == base["df"]
    for ch in ("ch1", "ch2"):
        np.testing.assert_array_equal(fast[ch]["indice"], base[ch]["indice"])
        np.testing.assert_allclose(
            fast[ch]["correction"], base[ch]["correction"], atol=1e-4
        )
        np.testing.assert_allclose(
            fast[ch]["snr_r"], base[ch]["snr_r"], rtol=1e-3
        )
    assert fast["timing"]["total_s"] > 0


def test_overlapped_float16_ingest(small_cfg, tmp_path):
    """float16 ingest (the accelerator default: the tunnel moves f16 at
    ~4x the f32 byte rate) recovers the same delays; quantization is
    -66 dB (exact below |2048|) so corrections move < 1e-2 samples."""
    import numpy as np

    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.utils import io

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=1,
        seed=5,
    )
    cap = str(tmp_path / "1755400000.bin")
    io.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True, df_decimation=5)

    f32 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=16,
        out_mat=str(tmp_path / "f32.mat"), ingest_dtype="float32",
    )
    f16 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=16,
        out_mat=str(tmp_path / "f16.mat"), ingest_dtype="float16",
    )
    for ch in ("ch1", "ch2"):
        np.testing.assert_array_equal(f16[ch]["indice"], f32[ch]["indice"])
        np.testing.assert_allclose(
            f16[ch]["correction"], f32[ch]["correction"], atol=1e-2
        )


def test_cli_goranging_fast(small_cfg, tmp_path, capsys):
    """twstft-tpu goranging --fast routes through the IO-overlapped
    pipeline and emits the same .mat contract."""
    from amaranth_twstft_tpu.utils import matio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=1, seed=7,
    )
    cap = str(tmp_path / "1755400099.bin")
    io.write_sc16(cap, meas, ref)
    rc = cli.main([
        "goranging", cap, code, "--fast",
        "--fs", str(small_cfg.fs), "--chip-rate", str(small_cfg.chip_rate),
        "--code-len", str(small_cfg.code_len),
        "--bitlen", str(small_cfg.bit_len), "--taps", str(small_cfg.taps),
    ])
    assert rc == 0
    mat_path = capsys.readouterr().out.strip()
    assert os.path.exists(mat_path)
    loaded = matio.load_result(mat_path)
    d1 = float(np.median(loaded["solution1"])) / 3.0
    assert abs(d1 - 431.4) < 0.1


def test_cli_dllpll_banked(small_cfg, tmp_path, capsys):
    """twstft-tpu dllpll reaches the BankedReceiver (homogeneous
    geometry) and writes the reference .dat/log products via --out-dir
    (VERDICT r02 item 5)."""
    import dataclasses

    from amaranth_twstft_tpu.models.dllpll import dat_filename

    cfg_b = dataclasses.replace(small_cfg, taps=27)
    a_stream, = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=137.0, doppler_hz=100.0, amplitude=900,
                    noise_sigma=80)],
        n_seconds=4, seed=31,
        extra_emissions=[
            (cfg_b, ChannelSim(delay_samples=555.0, doppler_hz=-150.0,
                               amplitude=900, noise_sigma=0.0))
        ],
    )
    cap = str(tmp_path / "cap.bin")
    io.write_sc16(cap, a_stream, np.zeros_like(a_stream))
    param = tmp_path / "sdr.param"
    param.write_text(
        "A N 100 100.0 50 50 400 50 18\n"
        "A N 101 -150.0 50 50 400 50 18\n"
    )
    out_dir = tmp_path / "out"
    rc = cli.main([
        "dllpll", cap, "--param", str(param), "--fs", str(small_cfg.fs),
        "--seconds", "4", "--out-dir", str(out_dir),
        "--bitlen", "10", "--code-len", "1000", "--nlag", "8",
        "--taps-map", "100=9,101=27",
    ])
    assert rc == 0
    out = capsys.readouterr()
    rows = [ln for ln in out.out.splitlines() if ln.strip()]
    assert any("PRN100" in r for r in rows)
    assert any("PRN101" in r for r in rows)
    # banked receiver wrote the reference products
    from amaranth_twstft_tpu.models.dllpll import ChannelConfig

    dat = out_dir / dat_filename(ChannelConfig(
        physical="A", prn_id=100, chip_rate=5e4))
    assert dat.exists(), list(out_dir.iterdir())
    assert (out_dir / "rxcomplex.log").exists()
    assert "acquisition" in (out_dir / "rxcomplex.log").read_text()


def test_cli_dllpll_follow_growing_capture(small_cfg, tmp_path, capsys):
    """--follow tails a capture while the SDR is still writing it (the
    reference receiver's live mode): seconds appended AFTER the CLI
    starts must still be tracked, and the loop must end on its own at
    --idle-timeout once growth stops."""
    import threading
    import time

    a_stream, = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=137.0, doppler_hz=100.0, amplitude=900,
                    noise_sigma=60)],
        n_seconds=4, seed=33,
    )
    fs = int(small_cfg.fs)
    cap = str(tmp_path / "grow.bin")
    # one second on disk at start; three more arrive while following
    frame = np.empty((fs, 4), np.int16)

    def sec_bytes(s):
        z = a_stream[s * fs:(s + 1) * fs]
        frame[:, 0] = np.clip(np.round(z.real), -32768, 32767)
        frame[:, 1] = np.clip(np.round(z.imag), -32768, 32767)
        frame[:, 2:] = 0
        return frame.tobytes()

    with open(cap, "wb") as f:
        f.write(sec_bytes(0))

    def writer():
        for s in range(1, 4):
            time.sleep(0.5)
            with open(cap, "ab") as f:
                f.write(sec_bytes(s))

    th = threading.Thread(target=writer)
    param = tmp_path / "sdr.param"
    param.write_text("A N 100 100.0 50 50 400 50 18\n")
    th.start()
    rc = cli.main([
        "dllpll", cap, "--param", str(param), "--fs", str(small_cfg.fs),
        "--follow", "--idle-timeout", "3",
        "--bitlen", "10", "--code-len", "1000", "--nlag", "8",
        "--taps-map", "100=9",
    ])
    th.join()
    assert rc == 0
    rows = [
        ln for ln in capsys.readouterr().out.splitlines() if "PRN100" in ln
    ]
    # 3 seconds exist in full at the end (the last needs fs+nobs, so the
    # receiver reports seconds 1..2 after acquiring in second 0); the
    # key assertion: at least one tracked second arrived AFTER start
    assert rows, "no tracked seconds from the growing capture"
    assert any(int(r.split()[0]) >= 1 for r in rows), rows


def test_cli_goranging_sharded(small_cfg, tmp_path, capsys):
    """twstft-tpu goranging --sharded routes through the multi-device
    pipeline (epoch axis over all visible devices)."""
    from amaranth_twstft_tpu.utils import matio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=7,
    )
    cap = str(tmp_path / "1755400098.bin")
    io.write_sc16(cap, meas, ref)
    rc = cli.main([
        "goranging", cap, code, "--sharded", "--batch-epochs", "10",
        "--fs", str(small_cfg.fs), "--chip-rate", str(small_cfg.chip_rate),
        "--code-len", str(small_cfg.code_len),
        "--bitlen", str(small_cfg.bit_len), "--taps", str(small_cfg.taps),
    ])
    assert rc == 0
    mat_path = capsys.readouterr().out.strip()
    assert os.path.exists(mat_path)
    loaded = matio.load_result(mat_path)
    d1 = float(np.median(loaded["solution1"])) / 3.0
    assert abs(d1 - 431.4) < 0.1


def test_overlapped_int8_ingest(small_cfg, tmp_path):
    """ingest_dtype="int8" (half-byte transfer mode): delays stay within
    the measured sub-0.1-ns envelope of the float32 path (PARITY
    deviation 10 table: p99 39.9 ps at production geometry)."""
    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=7,
    )
    cap = str(tmp_path / "cap8.bin")
    io.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)
    o32 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=20,
        ingest_dtype="float32", out_mat=str(tmp_path / "o32.mat"),
    )
    o8 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=20,
        ingest_dtype="int8", out_mat=str(tmp_path / "o8.mat"),
    )
    d32 = (np.asarray(o32["ch1"]["indice"]) + o32["ch1"]["correction"]) / 3.0
    d8 = (np.asarray(o8["ch1"]["indice"]) + o8["ch1"]["correction"]) / 3.0
    # small-geometry fs=1e5: one sample = 10 us; bound in SAMPLES scaled
    # from the production-measured error (0.0545 ns at 5 MS/s = 2.7e-4
    # samples); allow 10x for the coarser test geometry statistics
    assert np.max(np.abs(d8 - d32)) < 3e-3, np.max(np.abs(d8 - d32))
    d1 = float(np.median(d8))
    assert abs(d1 - 431.4) < 0.1


def test_overlapped_sc16_ingest_bit_identical(small_cfg, tmp_path):
    """ingest_dtype="sc16"/"int16" (raw wire-format ship, device-side
    dequant): numerically identical to float32 ingest — the int16 -> f32
    cast is exact for every sc16 sample — at half the transfer bytes and
    zero host conversion (VERDICT r03 item 1b); dual-channel and remote.

    The comparison allows ulp-level slack on the float outputs only
    because the CPU backend's threaded matmuls are non-deterministic in
    reduction order run to run (measured ~5e-7 even f32-vs-f32 on the
    SAME inputs); the mode itself introduces no error (identical f32
    inputs reach the device program — asserted exactly in
    tests/test_native.py::test_raw16_reader)."""
    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=11,
    )
    cap = str(tmp_path / "cap16.bin")
    io.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)
    for remote in (False, True):
        o32 = pipeline.process_capture_overlapped(
            cap, code, small_cfg, proc, remote=remote, batch_epochs=20,
            ingest_dtype="float32", out_mat=str(tmp_path / "s32.mat"),
        )
        o16 = pipeline.process_capture_overlapped(
            cap, code, small_cfg, proc, remote=remote, batch_epochs=20,
            ingest_dtype="sc16", out_mat=str(tmp_path / "s16.mat"),
        )
        np.testing.assert_array_equal(
            np.asarray(o32["ch1"]["indice"]),
            np.asarray(o16["ch1"]["indice"]),
        )
        for k in ("correction", "snr_r", "puissance"):
            np.testing.assert_allclose(
                np.asarray(o32["ch1"][k]), np.asarray(o16["ch1"][k]),
                rtol=0, atol=2e-5, err_msg=f"{k} (remote={remote})",
            )
        if not remote:
            np.testing.assert_allclose(
                np.asarray(o32["ch2"]["correction"]),
                np.asarray(o16["ch2"]["correction"]),
                rtol=0, atol=2e-5,
            )
        assert o32["df"] == o16["df"]


def test_overlapped_remote_int8_ingest(small_cfg, tmp_path):
    """Remote (single-channel) mode supports the int8 transfer format:
    channel 1's columns are extracted and quantized before shipping
    (half the single-channel f16 bytes), and the delays stay within the
    measured int8 envelope of the float32 path."""
    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=9,
    )
    cap = str(tmp_path / "capr.bin")
    io.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)
    o32 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, remote=True, batch_epochs=20,
        ingest_dtype="float32", out_mat=str(tmp_path / "r32.mat"),
    )
    o8 = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, remote=True, batch_epochs=20,
        ingest_dtype="int8", out_mat=str(tmp_path / "r8.mat"),
    )
    assert o8["ch2"] is None and o32["ch2"] is None
    d32 = (np.asarray(o32["ch1"]["indice"]) + o32["ch1"]["correction"]) / 3.0
    d8 = (np.asarray(o8["ch1"]["indice"]) + o8["ch1"]["correction"]) / 3.0
    assert np.max(np.abs(d8 - d32)) < 3e-3, np.max(np.abs(d8 - d32))
    assert abs(float(np.median(d8)) - 431.4) < 0.1


def test_prepass_pack_int8_scale_invariant(small_cfg, tmp_path):
    """The accelerator df pre-pass in int8 mode quantizes WITHOUT a
    scale (the squaring-spectrum argmax is scale-invariant); the
    estimate must match the float32 pre-pass to within a bin.  Also
    guards the sharded path's former bug of casting floats straight to
    int8 (overflow garbage) via pack_complex(dtype=int8)."""
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops.doppler import (
        bound_prepass_window,
        per_file_df_ri,
    )
    from amaranth_twstft_tpu.pipeline import _pack_prepass

    meas, _ = synthesize_capture(
        small_cfg,
        [ChannelSim(100.0, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(5.0, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=3,
    )
    cap = str(tmp_path / "capp.bin")
    io.write_sc16(cap, meas, meas)
    decim = 5
    dec = bound_prepass_window(io.decimate_sc16(cap, decim, channels=2))
    x = dec[0]
    p8 = _pack_prepass(x, np.int8)
    assert p8.dtype == np.int8 and np.abs(p8).max() <= 127
    df8 = float(per_file_df_ri(jnp.asarray(p8), small_cfg.fs, decim))
    df32 = float(per_file_df_ri(
        jnp.asarray(_pack_prepass(x, np.float32)), small_cfg.fs, decim
    ))
    bin_hz = small_cfg.fs / decim / len(x)
    assert abs(df8 - df32) < 2 * bin_hz + 1e-6, (df8, df32)
    assert abs(df8 - 130.0) < 5.0, df8


def test_resolve_ingest_dtype_ladder():
    """parity_ns picks the cheapest format whose measured p99 (x2) fits."""
    from amaranth_twstft_tpu.pipeline import _resolve_ingest_dtype as r

    assert r("float16", 0.0, True) == "float16"  # explicit wins
    assert r("sc16", None, True) == "int16"  # alias for the raw ship
    assert r(None, None, False) == "float32"  # CPU always f32
    assert r(None, None, True) == "int16"  # no budget: bit-exact raw sc16
    assert r(None, 0.1, True) == "int8"  # the north-star budget
    assert r(None, 1.0, True) == "int8"
    # below the int8 budget: raw sc16 (bit-identical to f32 ingest at
    # half the bytes) regardless of how small the budget is
    assert r(None, 0.05, True) == "int16"
    assert r(None, 0.001, True) == "int16"


def test_every_subcommand_help_exits_clean(capsys):
    """Arg-wiring smoke: each subcommand parses -h (a broken add_argument
    or duplicate dest raises at parser build, not at dispatch)."""
    import pytest as _pytest

    for cmd in ("prn", "ranging", "goranging", "claudio", "gofinal",
                "twoway", "go1s", "campaign", "dllpll", "batch",
                "monitor", "acquire", "emit", "config"):
        with _pytest.raises(SystemExit) as e:
            cli.main([cmd, "-h"])
        assert e.value.code == 0, cmd
        out = capsys.readouterr().out
        assert out.startswith(f"usage: twstft-tpu {cmd}"), (cmd, out[:60])


def test_overlapped_remote_partial_final_batch(small_cfg, tmp_path):
    """Remote mode pads the final partial batch to the compiled shape
    (a fresh tail shape would recompile); all epochs come back and the
    padding rows are dropped."""
    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=21,
    )
    cap = str(tmp_path / "capp16.bin")
    io.write_sc16(cap, meas, ref)
    # 100 epochs, batches of 30 -> final batch of 10 (padded)
    for dtype in ("float32", "sc16", "int8"):
        out = pipeline.process_capture_overlapped(
            cap, code, small_cfg, ProcessingConfig(hamming_window=True),
            remote=True, batch_epochs=30, ingest_dtype=dtype,
            out_mat=str(tmp_path / f"rp_{dtype}.mat"),
        )
        ind = np.asarray(out["ch1"]["indice"])
        assert len(ind) == 100, (dtype, len(ind))
        d1 = float(np.median(ind + out["ch1"]["correction"])) / 3.0
        assert abs(d1 - 431.4) < 0.1, (dtype, d1)
