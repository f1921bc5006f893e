"""claudio per-code aligned chain: df lock, tracking, slip re-acquisition."""

import numpy as np
import pytest

from amaranth_twstft_tpu.config import ProcessingConfig, StationConfig
from amaranth_twstft_tpu.models import claudio
from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops.lfsr import write_prn_file
from amaranth_twstft_tpu.utils import io


@pytest.fixture(scope="module")
def proc():
    return ProcessingConfig(
        conjugate_data=True,
        block_seconds=0.5,
        skip_seconds=0.0,
        df_threshold=20.0,
    )


@pytest.fixture(scope="module")
def single_channel_capture(small_cfg, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("claudio")
    code_path = str(tmp / "code.bin")
    write_prn_file(code_path, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    (stream,) = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=333.0, doppler_hz=150.0, amplitude=1500,
                    noise_sigma=150)],
        n_seconds=2,
        seed=9,
    )
    cap = str(tmp / "1755400000_2.bin")
    io.write_sc16(cap, stream)
    return cap, code_path, tmp


def test_claudio_tracks_delay(small_cfg, proc, single_channel_capture):
    cap, code_path, tmp = single_channel_capture
    out = claudio.process_file(
        cap, code_path, small_cfg, proc, StationConfig(), ranging=True,
        out_dir=str(tmp),
    )
    assert out is not None and out["found"]
    # After the initial MOVED re-alignment the chain parks the peak ~21
    # samples into each window (claudio_...separate.m:183: dindex
    # -= indice - 21) and the per-code indice stays put.
    ind = out["indice"]
    assert len(out["moved"]) >= 1
    assert abs(np.median(ind) - 21.0) < 2.0, np.median(ind)
    assert np.std(ind[2:]) < 1.0
    assert abs(np.median(out["df"]) - 150.0) < 2.0
    # SNR is healthy once code-aligned
    snr_db = 10 * np.log10(out["snr_r"] + out["snr_i"])
    assert np.median(snr_db) > 3
    # idempotent resume: second run returns None
    assert claudio.process_file(
        cap, code_path, small_cfg, proc, StationConfig(), ranging=True,
        out_dir=str(tmp),
    ) is None


def test_claudio_slip_reacquisition(small_cfg, proc, tmp_path):
    """Delete samples mid-stream (sample-loss event): the chain must flag
    MOVED and keep tracking the (shifted) delay afterwards."""
    code_path = str(tmp_path / "code.bin")
    write_prn_file(code_path, small_cfg.bit_len, small_cfg.code_len,
                   small_cfg.taps)
    (stream,) = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=20.0, doppler_hz=0.0, amplitude=1500,
                    noise_sigma=100)],
        n_seconds=2,
        seed=3,
    )
    # drop 500 samples at 1.0 s — a gross code slip
    cut = int(small_cfg.fs)
    broken = np.concatenate([stream[:cut], stream[cut + 500 :]])
    cap = str(tmp_path / "1755400001_2.bin")
    io.write_sc16(cap, broken)
    out = claudio.process_file(
        cap, code_path, small_cfg, proc, StationConfig(), ranging=True,
        out_dir=str(tmp_path),
    )
    assert out is not None and out["found"]
    assert len(out["moved"]) >= 1
    # after re-acquisition the tracked delay stabilizes again (low spread
    # over the last quarter of epochs)
    delays = (out["indice"] + out["correction"] / 3.0)
    tail = delays[-len(delays) // 4 :]
    assert np.std(tail) < 1.0
