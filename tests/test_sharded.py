"""Sharded CAF step: shard-count invariance, halos, slip offsets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
from amaranth_twstft_tpu.ops.caf import doppler_bins
from amaranth_twstft_tpu.ops.lfsr import prn_chips
from amaranth_twstft_tpu.ops.prn import (
    chips_to_pm1,
    code_spectrum,
    interp_code,
    upsample_zoh,
)
from amaranth_twstft_tpu.parallel.mesh import make_mesh
from amaranth_twstft_tpu.parallel.sharded import make_sharded_caf_step, shard_blocks


@pytest.fixture(scope="module")
def setup(small_cfg):
    cfg = small_cfg
    L = cfg.samples_per_code
    (stream,) = synthesize_capture(
        cfg,
        [ChannelSim(delay_samples=100.5, doppler_hz=180.0, amplitude=900,
                    noise_sigma=200)],
        n_seconds=2,
        seed=3,
    )
    code = chips_to_pm1(
        upsample_zoh(prn_chips(cfg.bit_len, cfg.taps, cfg.code_len), 2)
    )
    fcode = jnp.asarray(code_spectrum(code))
    code3 = jnp.asarray(interp_code(code, 3))
    shifts, _ = doppler_bins(cfg.fs, L, -500, 500, 50.0)
    return cfg, stream, fcode, code3, shifts


def _blocks(stream, n_time, epb, L, halo):
    blocks = np.zeros((n_time, epb * L + halo), dtype=np.complex128)
    for i in range(n_time):
        seg = stream[i * epb * L : i * epb * L + epb * L + halo]
        blocks[i, : len(seg)] = seg
    return blocks


def test_shard_count_invariance(setup):
    """Identical numerics at 1x1, 4x2 and 8x1 meshes (SURVEY.md §4.6)."""
    cfg, stream, fcode, code3, shifts = setup
    L = cfg.samples_per_code
    halo = L // 2
    results = {}
    for (nt, nc, epb) in [(1, 1, 16), (4, 2, 4), (8, 1, 2)]:
        mesh = make_mesh(nt, nc)
        step = make_sharded_caf_step(mesh, cfg.fs, L, epb, halo, caf_chunk=3)
        blocks = _blocks(stream, nt, epb, L, halo)
        args = shard_blocks(
            mesh, jnp.asarray(blocks), jnp.zeros(nt, jnp.int32), fcode,
            code3, shifts,
        )
        delay, df, pk, snr, xval = step(*args)
        results[(nt, nc)] = (
            np.asarray(delay).ravel(),
            np.asarray(df).ravel(),
            np.asarray(snr).ravel(),
        )
    base = results[(1, 1)]
    for key in [(4, 2), (8, 1)]:
        np.testing.assert_array_equal(base[0], results[key][0])
        np.testing.assert_array_equal(base[1], results[key][1])
        np.testing.assert_allclose(base[2], results[key][2], rtol=1e-12)


def test_slip_offsets_use_halo(setup):
    """Nonzero per-block offsets reach into the ppermute'd halo and still
    recover the signal delay (the `dold` carry as a collective)."""
    cfg, stream, fcode, code3, shifts = setup
    L = cfg.samples_per_code
    halo = L // 2
    nt, epb = 4, 4
    mesh = make_mesh(nt, 2)
    step = make_sharded_caf_step(mesh, cfg.fs, L, epb, halo, caf_chunk=3)
    blocks = _blocks(stream, nt, epb, L, halo)
    # zero the INTERIOR shards' host halos: the step must fetch those
    # from the next shard via ppermute.  The LAST shard keeps its
    # host-supplied halo (the true continuation) — it has no successor,
    # and the ring must NOT hand it the first shard's head
    blocks[:-1, epb * L :] = 0
    offsets = np.asarray([0, 40, 333, 999], np.int32)
    args = shard_blocks(
        mesh, jnp.asarray(blocks), jnp.asarray(offsets), fcode, code3, shifts
    )
    delay, df, pk, snr, xval = step(*args)
    delay = np.asarray(delay)
    # each block's epochs start `offset` later, so the measured delay
    # drops by offset (mod L)
    for i, off in enumerate(offsets):
        expected = np.mod(100.5 - off, L)
        np.testing.assert_allclose(delay[i], expected, atol=0.2)


def test_sharded_step_fast_paths_match():
    """The fast (windowed zoom-DFT) and mxu_fft paths compose with the
    sharded step: identical delays vs the exact path on the same mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.caf import doppler_bins
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1, code_spectrum, interp_code, upsample_zoh,
    )
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.parallel.sharded import (
        make_sharded_caf_step, shard_blocks,
    )

    mesh = make_mesh(2, 2)
    cfg = SignalConfig(fs=1e5, chip_rate=5e4, code_len=500, bit_len=10, taps=9)
    L = cfg.samples_per_code
    epb, halo = 2, L // 2
    (stream,) = synthesize_capture(
        cfg, [ChannelSim(delay_samples=77.4, doppler_hz=150.0,
                         amplitude=900, noise_sigma=120)],
        n_seconds=1, seed=3,
    )
    blocks = np.zeros((2, epb * L + halo), dtype=np.complex128)
    for i in range(2):
        seg = stream[i * epb * L : i * epb * L + epb * L + halo]
        blocks[i, : len(seg)] = seg
    offsets = np.zeros(2, np.int32)
    code = chips_to_pm1(upsample_zoh(prn_chips(cfg.bit_len, cfg.taps,
                                               cfg.code_len), 2))
    fcode = jnp.asarray(np.asarray(code_spectrum(code)))
    code3 = jnp.asarray(interp_code(code, 3))
    shifts, _ = doppler_bins(cfg.fs, L, -500.0, 500.0, 100.0)

    outs = {}
    for name, kw in (("exact", {}), ("fast", {"fast": True}),
                     ("mxu", {"mxu_fft": True})):
        step = make_sharded_caf_step(mesh, cfg.fs, L, epb, halo,
                                     caf_chunk=2, **kw)
        args = shard_blocks(mesh, jnp.asarray(blocks), jnp.asarray(offsets),
                            fcode, code3, shifts)
        delay = np.asarray(step(*args)[0]).ravel()
        outs[name] = delay
    np.testing.assert_allclose(outs["fast"], outs["exact"], atol=1e-9)
    np.testing.assert_allclose(outs["mxu"], outs["exact"], atol=1e-7)
    np.testing.assert_allclose(outs["exact"], 77.4, atol=0.5)


def test_sharded_lagbank_matches_unsharded():
    """Channel-axis sharding of the DLL/PLL lag bank is result-invariant."""
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops.lagbank import lag_bank_correlate
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.parallel.sharded import make_sharded_lagbank_step

    rng = np.random.default_rng(11)
    C, codes, nobs, nlags = 8, 6, 512, 9
    obs = rng.normal(size=(C, 2, codes, nobs)).astype(np.float32)
    wav = rng.normal(size=(C, nobs, nlags)).astype(np.float32)

    mesh = make_mesh(2, 4)
    step = make_sharded_lagbank_step(mesh)
    pw, ph = step(jnp.asarray(obs), jnp.asarray(wav))
    pw, ph = np.asarray(pw), np.asarray(ph)

    for c in range(C):
        pw1, ph1 = lag_bank_correlate(jnp.asarray(obs[c]), jnp.asarray(wav[c]))
        np.testing.assert_allclose(pw[c], np.asarray(pw1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ph[c], np.asarray(ph1), rtol=1e-5, atol=1e-6)


def test_sharded_pipeline_matches_single_device(small_cfg, tmp_path):
    """process_capture_sharded on a 1-device and an 8-device mesh produce
    equivalent results (and both match process_capture_overlapped).

    Byte-identity is NOT attainable on the virtual CPU mesh: the 8
    virtual devices split the host's intra-op thread pool, so XLA tiles
    reductions differently per device count and float summation order
    changes (max observed rel. diff ~1e-7).  On real TPU chips each
    core's schedule is device-count independent.  The assertion is
    therefore tight-tolerance equivalence plus exact delay-index
    agreement.
    """
    import os

    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.utils import io as uio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=4, seed=7,
    )
    cap = str(tmp_path / "cap.bin")
    uio.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)

    single = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=25,
        out_mat=str(tmp_path / "single.mat"),
    )
    out8 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(8, 1), batch_epochs=25,
        out_mat=str(tmp_path / "s8.mat"),
    )
    assert out8["timing"]["n_devices"] == 8
    assert os.path.exists(out8["mat_path"])
    # same df pre-pass, bit-exact
    np.testing.assert_array_equal(single["df"], out8["df"])
    for c in ("ch1", "ch2"):
        # the integer delay index and its sub-sample correction agree
        np.testing.assert_array_equal(
            single[c]["indice"], out8[c]["indice"]
        )
        np.testing.assert_allclose(
            single[c]["correction"], out8[c]["correction"], atol=2e-5
        )
        for k in ("snr_r", "snr_i", "puissance", "puissance_code",
                  "puissance_noise"):
            np.testing.assert_allclose(
                single[c][k], out8[c][k], rtol=1e-4, atol=1e-6
            )
    # ground truth recovered through the mesh
    d1 = float(np.median(out8["ch1"]["indice"] + out8["ch1"]["correction"])) / 3.0
    d2 = float(np.median(out8["ch2"]["indice"] + out8["ch2"]["correction"])) / 3.0
    assert abs(d1 - 431.4) < 0.1 and abs(d2 - 12.75) < 0.1, (d1, d2)


def test_sharded_pipeline_nint4_accuracy_mode(small_cfg, tmp_path):
    """Shard invariance extends to the nint=4 fine-grid accuracy mode
    (PARITY deviation 11): the 8-device mesh agrees with the single
    device path on the 9x-interpolated delay index, and the recovered
    fractional delay is within the mode's sub-sample bias envelope."""
    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.utils import io as uio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.37, 130.0, amplitude=1200, noise_sigma=120),
         ChannelSim(12.81, 5.0, amplitude=2000, noise_sigma=80)],
        n_seconds=2, seed=11,
    )
    cap = str(tmp_path / "cap4.bin")
    uio.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True, nint=4)

    single = pipeline.process_capture_overlapped(
        cap, code, small_cfg, proc, batch_epochs=20,
        out_mat=str(tmp_path / "s1.mat"),
    )
    out8 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(8, 1), batch_epochs=10,
        out_mat=str(tmp_path / "s8.mat"),
    )
    for c in ("ch1", "ch2"):
        np.testing.assert_array_equal(single[c]["indice"], out8[c]["indice"])
        np.testing.assert_allclose(
            single[c]["correction"], out8[c]["correction"], atol=2e-5
        )
    d1 = float(np.median(out8["ch1"]["indice"] + out8["ch1"]["correction"])) / 9.0
    # fractional truth recovered well inside one 3x-grid bias envelope
    assert abs(d1 - 431.37) < 0.02, d1


def test_sharded_pipeline_remote_mode(small_cfg, tmp_path):
    """remote=True processes only the measurement channel (GoRanging's
    single-channel mode, processing/CPP/main.cpp:201-208)."""
    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.utils import io as uio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(250.0, 60.0, amplitude=900, noise_sigma=200),
         ChannelSim(12.0, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=9,
    )
    cap = str(tmp_path / "cap.bin")
    uio.write_sc16(cap, meas, ref)
    out = pipeline.process_capture_sharded(
        cap, code, small_cfg, ProcessingConfig(hamming_window=True),
        mesh=make_mesh(4, 1), remote=True, batch_epochs=10,
        out_mat=str(tmp_path / "rem.mat"),
    )
    assert out["ch2"] is None
    d = float(np.median(out["ch1"]["indice"] + out["ch1"]["correction"])) / 3.0
    assert abs(d - 250.0) < 0.1, d


def test_sharded_pipeline_int8_ingest(small_cfg, tmp_path):
    """int8 transfer mode through the mesh: per-device sharded scales,
    delays within the measured envelope of the float32 path."""
    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.utils import io as uio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=7,
    )
    cap = str(tmp_path / "cap.bin")
    uio.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)
    o32 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(4, 1), batch_epochs=10,
        ingest_dtype="float32", out_mat=str(tmp_path / "s32.mat"),
    )
    o8 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(4, 1), batch_epochs=10,
        ingest_dtype="int8", out_mat=str(tmp_path / "s8.mat"),
    )
    d32 = (np.asarray(o32["ch1"]["indice"]) + o32["ch1"]["correction"]) / 3.0
    d8 = (np.asarray(o8["ch1"]["indice"]) + o8["ch1"]["correction"]) / 3.0
    assert np.max(np.abs(d8 - d32)) < 3e-3, np.max(np.abs(d8 - d32))
    assert abs(float(np.median(d8)) - 431.4) < 0.1


def test_sharded_pipeline_sc16_ingest(small_cfg, tmp_path):
    """Raw sc16 transfer mode through the mesh: numerically identical to
    float32 ingest (exact device-side cast) at half the bytes and zero
    host conversion, across shards (indice exact, float outputs to
    CPU threaded-matmul reproducibility)."""
    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.utils import io as uio

    code = str(tmp_path / "code.bin")
    write_prn_file(code, small_cfg.bit_len, small_cfg.code_len, small_cfg.taps)
    meas, ref = synthesize_capture(
        small_cfg,
        [ChannelSim(431.4, 130.0, amplitude=900, noise_sigma=250),
         ChannelSim(12.75, 5.0, amplitude=2000, noise_sigma=100)],
        n_seconds=2, seed=13,
    )
    cap = str(tmp_path / "cap16.bin")
    uio.write_sc16(cap, meas, ref)
    proc = ProcessingConfig(hamming_window=True)
    o32 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(4, 1), batch_epochs=10,
        ingest_dtype="float32", out_mat=str(tmp_path / "t32.mat"),
    )
    o16 = pipeline.process_capture_sharded(
        cap, code, small_cfg, proc, mesh=make_mesh(4, 1), batch_epochs=10,
        ingest_dtype="sc16", out_mat=str(tmp_path / "t16.mat"),
    )
    np.testing.assert_array_equal(
        np.asarray(o32["ch1"]["indice"]), np.asarray(o16["ch1"]["indice"])
    )
    for ch in ("ch1", "ch2"):
        np.testing.assert_allclose(
            np.asarray(o32[ch]["correction"]),
            np.asarray(o16[ch]["correction"]), rtol=0, atol=2e-5,
        )
    assert o32["df"] == o16["df"]
    assert abs(float(np.median(
        (np.asarray(o16["ch1"]["indice"]) + o16["ch1"]["correction"]) / 3.0
    )) - 431.4) < 0.1


def test_real_io_boundary_matches_complex(setup):
    """`real_io=True` (the relay-safe f32 (..., 2) program boundary used
    on-device) produces the same results as the complex-boundary step."""
    cfg, stream, fcode, code3, shifts = setup
    L = cfg.samples_per_code
    halo = L // 2
    nt, nc, epb = 4, 2, 4
    mesh = make_mesh(nt, nc)
    blocks = _blocks(stream, nt, epb, L, halo).astype(np.complex64)
    offsets = jnp.zeros(nt, jnp.int32)

    step_c = make_sharded_caf_step(mesh, cfg.fs, L, epb, halo, caf_chunk=3)
    args = shard_blocks(mesh, jnp.asarray(blocks), offsets, fcode, code3,
                        shifts)
    delay_c, df_c, pk_c, snr_c, xval_c = step_c(*args)

    step_r = make_sharded_caf_step(mesh, cfg.fs, L, epb, halo, caf_chunk=3,
                                   real_io=True)
    blocks_ri = np.stack([blocks.real, blocks.imag], axis=-1)
    fc = np.asarray(fcode)
    fcode_ri = np.stack([fc.real, fc.imag], axis=-1).astype(np.float32)
    sh = np.asarray(shifts)
    pad = (-sh.shape[0]) % nc  # duplicate-last padding, as shard_blocks
    sh = np.concatenate([sh, np.repeat(sh[-1:], pad)])
    delay_r, df_r, pk_r, snr_r, xval_ri = step_r(
        jnp.asarray(blocks_ri), offsets, jnp.asarray(fcode_ri), code3,
        jnp.asarray(sh),
    )
    # the complex-path fixture carries f64 replica spectra; real_io packs
    # f32 — identical algorithm, so agreement to f32 rounding only
    np.testing.assert_allclose(np.asarray(delay_c), np.asarray(delay_r),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(df_c), np.asarray(df_r))
    np.testing.assert_allclose(np.asarray(snr_c), np.asarray(snr_r),
                               rtol=1e-4)
    xv = np.asarray(xval_ri)
    xc = np.asarray(xval_c)
    atol = 1e-4 * float(np.abs(xc).max())  # f32 accumulation noise floor
    np.testing.assert_allclose(xc.real, xv[..., 0], rtol=1e-4, atol=atol)
    np.testing.assert_allclose(xc.imag, xv[..., 1], rtol=1e-4, atol=atol)
