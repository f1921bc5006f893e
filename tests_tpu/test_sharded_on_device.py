"""Sharded (shard_map + collective) paths ON the real accelerator.

VERDICT r04 item 2 / missing-1: every ``ppermute``/``all_gather`` path
(`parallel/sharded.py`, the channel-sharded tracker) had only ever
lowered on CPU virtual meshes — a TPU-backend lowering failure in the
halo exchange would have shipped undetected.  These cases build a
1-device mesh on the chip itself and run the halo'd CAF step and the
channel-sharded tracking bank at PRODUCTION L=200 000 with truth
assertions, proving the collective lowering and the real-dtype program
boundary on the deployment backend.  (Multi-device meshes are exercised
by the driver's 8-device CPU dryrun and the 2-process cases; this rig
has one chip.)

Reference analog: the reference's concurrency always ran on its real
deployment host (``processing/CPP/main.cpp:180-187,488-497``); the halo
semantics mirror ``acquisition/claudio_aligned_code_ranging_separate.m:196-200``.
"""

import numpy as np


def test_sharded_caf_step_on_device(accel, prod_cfg):
    """The overlap-save halo'd CAF step (ppermute + all_gather peak
    reduction) compiles and runs on the accelerator backend, recovering
    an injected delay/Doppler at production geometry."""
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops.caf import doppler_bins
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1,
        code_spectrum,
        interp_code,
        upsample_zoh,
    )
    from amaranth_twstft_tpu.parallel.mesh import make_mesh
    from amaranth_twstft_tpu.parallel.sharded import make_sharded_caf_step

    cfg = prod_cfg
    L = cfg.samples_per_code
    epb, halo = 2, L // 2
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    code = chips_to_pm1(
        upsample_zoh(
            prn_chips(cfg.bit_len, cfg.taps, cfg.code_len),
            cfg.samples_per_chip,
        ),
        np.float32,
    )
    rng = np.random.default_rng(5)
    delay_true, dop_true = 1234, 125.0
    n_stream = epb * L + halo
    t = np.arange(n_stream) / cfg.fs
    stream = (
        800.0
        * np.tile(np.roll(code, delay_true), n_stream // L + 1)[:n_stream]
        * np.exp(2j * np.pi * dop_true * t)
        + rng.normal(0, 200, n_stream)
        + 1j * rng.normal(0, 200, n_stream)
    ).astype(np.complex64)

    # real-dtype boundary (relay rule: complex never crosses h2d/d2h)
    blocks_ri = np.stack([stream.real, stream.imag], axis=-1)[None]
    fcode = np.asarray(code_spectrum(code)).astype(np.complex64)
    fcode_ri = np.stack([fcode.real, fcode.imag], axis=-1)
    code3 = interp_code(code, 3).astype(np.float32)
    shifts, _ = doppler_bins(cfg.fs, L, -500.0, 500.0, 25.0)

    step = make_sharded_caf_step(
        mesh, cfg.fs, L, epb, halo, caf_chunk=2, fast=True, mxu_fft=True,
        real_io=True,
    )
    delay, df, pk, snr, xval_ri = step(
        jnp.asarray(blocks_ri),
        jnp.asarray(np.zeros(1, np.int32)),
        jnp.asarray(fcode_ri),
        jnp.asarray(code3),
        jnp.asarray(shifts),
    )
    d = np.asarray(delay).ravel()
    df0 = float(np.asarray(df).ravel()[0])
    print(f"\n[tpu] sharded CAF on {accel}: delay {d} (truth {delay_true}) "
          f"df {df0:.1f} (truth {dop_true})", flush=True)
    assert d.shape == (epb,)
    assert np.all(np.abs(d - delay_true) < 1.0), d
    assert abs(df0 - dop_true) < cfg.fs / L  # within one bin
    assert np.asarray(xval_ri).shape == (1, epb, 2)
    # detection-level sanity only (estimator parity is covered by the
    # CPU oracle tests); this geometry reports ~6.2 dB box SNR
    assert np.all(np.asarray(snr) > 3.0)
    assert np.all(np.isfinite(np.asarray(snr)))


def test_sharded_tracker_step_on_device(accel, prod_cfg):
    """The channel-sharded production-geometry tracking bank runs on the
    accelerator mesh — with the int4 nibble-packed transfer format —
    and locks on the injected signal."""
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.models.dllpll import ChannelConfig, build_channel
    from amaranth_twstft_tpu.models.tracker import (
        build_bank,
        make_sharded_tracker_step,
        pack_int4_ri,
        phase_tables,
        unpack_track_outputs,
    )
    from amaranth_twstft_tpu.ops.lfsr import find_mseq_taps
    from amaranth_twstft_tpu.parallel.mesh import make_mesh

    cfg = prod_cfg
    C = 2
    taps = find_mseq_taps(cfg.bit_len, C)
    chans = [
        build_channel(
            ChannelConfig(physical="A", prn_id=100 + i, taps=taps[i],
                          bit_len=cfg.bit_len, chip_rate=cfg.chip_rate,
                          code_len=cfg.code_len, nlag=8),
            cfg.fs,
        )
        for i in range(C)
    ]
    bank = build_bank(chans, cfg.fs)
    S = int(cfg.fs) + bank.nobs
    rng = np.random.default_rng(6)
    buf = rng.normal(0, 100, (1, S, 2)).astype(np.float32)
    sig = 900.0 * np.tile(chans[0].wav, S // bank.nobs + 1)[:S]
    buf[0, :, 0] += sig
    packed, scale = pack_int4_ri(buf)

    pt = np.zeros(C, np.int32)
    fc = np.zeros(C)
    theta, t1, t2 = phase_tables(bank, pt, fc)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    step = make_sharded_tracker_step(
        mesh,
        ncodes=bank.ncodes, nobs=bank.nobs, nlag=bank.nlag, bps=bank.bps,
        fs=cfg.fs, group=1,
    )
    outs = step(
        jnp.asarray(packed), jnp.asarray(bank.wav_ext),
        jnp.asarray(bank.psbb), jnp.asarray(np.zeros(C, np.int32)),
        jnp.asarray(pt), jnp.asarray(theta), jnp.asarray(t1),
        jnp.asarray(t2), jnp.asarray(np.zeros(C, np.float32)),
        jnp.float32(scale),
    )
    unpacked = unpack_track_outputs(np.asarray(outs))
    cnt, locked = unpacked[5], unpacked[8]
    print(f"\n[tpu] sharded tracker on {accel}: ch0 cnt={int(cnt[0])}/"
          f"{bank.bps} locked={bool(locked[0])} (int4 transfer)", flush=True)
    assert cnt.shape == (C,)
    assert locked[0] and cnt[0] >= bank.bps // 2, (cnt, locked)
    # (channel 1 sees only the OTHER PRN's strong signal; its repeating
    # cross-correlation profile can legitimately pass the tracking
    # gates — false-lock rejection lives in acquisition's SNR gate,
    # tested in tests/test_tracker.py — so no assertion on it here)


def test_claudio_resident_slip_reseek_on_device(accel, tmp_path):
    """Sample-loss slip through the ROLLING int8 resident path: a
    mid-file sample drop must trigger the MOVED re-seek across the
    device-resident carry and keep the delay series locked
    (claudio_...separate.m:176-186; the carry/slip machinery is the
    most fragile part of the resident design)."""
    import numpy as np

    from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig
    from amaranth_twstft_tpu.models import claudio
    from amaranth_twstft_tpu.ops.lfsr import prn_chips, write_prn_file
    from amaranth_twstft_tpu.ops.prn import chips_to_pm1, upsample_zoh

    cfg = SignalConfig(fs=1e5, chip_rate=5e4, code_len=1000, bit_len=10,
                       taps=9)
    fs, L = int(cfg.fs), cfg.samples_per_code
    code_path = str(tmp_path / "code.bin")
    write_prn_file(code_path, cfg.bit_len, cfg.code_len, cfg.taps)
    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip),
                        np.float64)
    rng = np.random.default_rng(9)
    t = np.arange(fs) / cfg.fs
    sec = (900 * np.tile(np.roll(code, 431), fs // L)
           * np.exp(2j * np.pi * 120.0 * t))
    full = np.concatenate([
        np.roll(sec, (s % 5) * L)
        + rng.normal(0, 150, fs) + 1j * rng.normal(0, 150, fs)
        for s in range(12)
    ])
    drop = 437  # mid-file sample loss
    cut = 6 * fs + 1234
    full = np.concatenate([full[:cut], full[cut + drop:]])
    cap = str(tmp_path / "cap_1.bin")
    a = np.empty((len(full), 2), np.int16)
    a[:, 0] = np.real(full)
    a[:, 1] = np.imag(full)
    a.tofile(cap)

    proc = ProcessingConfig(conjugate_data=True, skip_seconds=2.0)
    out = claudio.process_file(
        cap, code_path, cfg, proc, ranging=True, out_dir=str(tmp_path),
        transfer="int8", df_window_hz=(-500.0, 500.0),  # 2x120 Hz line
    )
    assert out["found"]
    moved = [m for m in out["moved"] if m > 1]  # beyond initial align
    print(f"\n[tpu] resident slip: moved={out['moved']} "
          f"epochs={len(out['indice'])}", flush=True)
    assert moved, "the induced sample loss must re-seek (MOVED)"
    ind = np.asarray(out["indice"])
    # after each re-seek the peak returns to the ~21-sample margin
    assert np.median(ind) == 21.0 or abs(np.median(ind) - 21.0) < 1.0
    # delay stays locked across the slip: no residual wander
    tail = ind[moved[-1] + 5 :]
    assert len(tail) > 50 and np.all(np.abs(tail - np.median(tail)) < 2.0)
