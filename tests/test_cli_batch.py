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
