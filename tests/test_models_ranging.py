"""File-level chain tests: godual (Octave semantics) and GoRanging (C++)."""

import numpy as np
import pytest

from amaranth_twstft_tpu.config import ProcessingConfig, StationConfig
from amaranth_twstft_tpu.models import godual, goranging
from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops.lfsr import write_prn_file
from amaranth_twstft_tpu.utils import io, matio

import jax.numpy as jnp

TRUTH = dict(d1=431.4, d2=12.75, f1=130.0, f2=5.0)


@pytest.fixture(scope="module")
def capture_files(small_cfg, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("capture")
    code_path = str(tmp / "code.bin")
    write_prn_file(code_path, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [
            ChannelSim(TRUTH["d1"], TRUTH["f1"], amplitude=900, noise_sigma=250),
            ChannelSim(TRUTH["d2"], TRUTH["f2"], amplitude=2000, noise_sigma=100),
        ],
        n_seconds=2,
        seed=5,
    )
    cap_path = str(tmp / "1755400000.bin")
    io.write_sc16(cap_path, meas, ref)
    return cap_path, code_path


def test_godual_chain(small_cfg, capture_files):
    cap, code = capture_files
    proc = ProcessingConfig(df_window_hz=(-2000, 2000))
    out = godual.process_file(
        cap,
        code,
        small_cfg,
        proc,
        StationConfig(op=True),
        batch_epochs=16,
        dtype=jnp.complex128,
    )
    ch1, ch2 = out["ch1"], out["ch2"]
    n_epochs = 2 * int(small_cfg.codes_per_second)
    assert len(ch1["indice"]) == n_epochs
    d1 = (ch1["indice"] + ch1["correction"]) / small_cfg.fs / 3 * small_cfg.fs
    d2 = (ch2["indice"] + ch2["correction"]) / small_cfg.fs / 3 * small_cfg.fs
    np.testing.assert_allclose(d1, TRUTH["d1"], atol=0.05)
    np.testing.assert_allclose(d2, TRUTH["d2"], atol=0.05)
    # mat archive written and reloadable with the Octave convention
    back = matio.load_result(out["mat_path"])
    np.testing.assert_allclose(back["solution1"], ch1["indice"] + ch1["correction"])


def test_godual_remote_single_channel(small_cfg, capture_files):
    cap, code = capture_files
    proc = ProcessingConfig(df_window_hz=(-2000, 2000))
    # remote on a local fixture: use a station whose remote window covers
    # the true 2*df spectral line (130 Hz -> 260 Hz)
    out = godual.process_file(
        cap,
        code,
        small_cfg,
        proc,
        StationConfig(op=False),
        remote=True,
        batch_epochs=32,
        dtype=jnp.complex128,
        out_mat=None,
    )
    assert out["ch2"] is None
    assert "remote" in out["mat_path"]


def test_goranging_chain_fixed_df(small_cfg, capture_files):
    cap, code = capture_files
    out = goranging.process_file(
        cap,
        code,
        small_cfg,
        ProcessingConfig(hamming_window=True, df_decimation=5),
        batch_epochs=16,
        dtype=jnp.complex128,
    )
    # fixed per-file df close to truth (decimated squaring-FFT resolution)
    assert abs(out["df"][0] - TRUTH["f1"]) < 15.0
    assert abs(out["df"][1] - TRUTH["f2"]) < 15.0
    ch1 = out["ch1"]
    d1 = (ch1["indice"] + ch1["correction"]) / 3
    np.testing.assert_allclose(d1, TRUTH["d1"], atol=0.1)
    # C-style mat reloads through the auto-detector (no indice field)
    back = matio.load_result(out["mat_path"])
    assert "solution1" in back
    np.testing.assert_allclose(back["solution1"], ch1["indice"] + ch1["correction"])
    assert out["mat_path"].endswith("C.mat")


def test_goranging_f32_matches_f64(small_cfg, capture_files):
    """complex64 chain (the TPU path) tracks complex128 to < 1e-3 samples."""
    cap, code = capture_files
    kw = dict(
        signal=small_cfg,
        proc=ProcessingConfig(hamming_window=True, df_decimation=5),
        batch_epochs=16,
    )
    o64 = goranging.process_file(cap, code, dtype=jnp.complex128, **kw)
    o32 = goranging.process_file(cap, code, dtype=jnp.complex64, **kw)
    d64 = (o64["ch1"]["indice"] + o64["ch1"]["correction"]) / 3
    d32 = (o32["ch1"]["indice"] + o32["ch1"]["correction"]) / 3
    assert np.max(np.abs(d64 - d32)) < 1e-3


def test_godual_fine_freq_refinement(small_cfg, capture_files):
    """The pyFFTW variant (godual_ranging_fftw.py:35-39): phase-drift
    refinement pulls df from the coarse squaring-FFT bin (50 Hz grid
    here) to sub-Hz of the injected Doppler."""
    cap, code = capture_files
    kw = dict(
        signal=small_cfg,
        station=StationConfig(op=True),
        batch_epochs=16,
        dtype=jnp.complex128,
    )
    coarse = godual.process_file(
        cap, code, proc=ProcessingConfig(df_window_hz=(-2000, 2000)), **kw
    )
    fine = godual.process_file(
        cap, code,
        proc=ProcessingConfig(df_window_hz=(-2000, 2000), fine_freq=True),
        **kw,
    )
    err_coarse = np.abs(coarse["ch1"]["df"] - TRUTH["f1"])
    err_fine = np.abs(fine["ch1"]["df"] - TRUTH["f1"])
    assert np.median(err_fine) < 1.0, np.median(err_fine)
    assert np.median(err_fine) < 0.5 * np.median(err_coarse)
    # delays unaffected (they were already df-tolerant)
    d1 = (fine["ch1"]["indice"] + fine["ch1"]["correction"]) / 3
    np.testing.assert_allclose(d1, TRUTH["d1"], atol=0.05)
