"""DLL/PLL receiver: acquisition, lock, tracking accuracy, loss/reacq."""

import numpy as np
import pytest

from amaranth_twstft_tpu.config import SignalConfig
from amaranth_twstft_tpu.models.dllpll import (
    ChannelConfig,
    Receiver,
    parse_sdr_param,
)
from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture


def small_chan(prn_taps, fc=0.0, **kw):
    return ChannelConfig(
        physical="A",
        prn_id=100,
        bit_len=10,
        taps=prn_taps,
        fc_init_hz=fc,
        chip_rate=5e4,
        code_len=1000,
        filter_hz=5e4,
        acq_range_hz=500.0,
        acq_step_hz=50.0,
        snr_min_db=20.0,
        nlag=8,
        **kw,
    )


@pytest.fixture(scope="module")
def two_prn_capture(small_cfg):
    """Two co-channel PRNs (taps 9 and 27) with distinct delays/Dopplers —
    the multi-PRN multi-channel scenario (BASELINE config[4])."""
    import dataclasses

    cfg_b = dataclasses.replace(small_cfg, taps=27)
    streams = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=137.0, doppler_hz=120.0, amplitude=900,
                    noise_sigma=120)],
        n_seconds=5,
        seed=17,
        extra_emissions=[
            (cfg_b, ChannelSim(delay_samples=555.0, doppler_hz=-210.0,
                               amplitude=900, noise_sigma=0.0))
        ],
    )
    return streams[0]


def test_parse_sdr_param():
    text = """# ch sic prn fc kcps flt frange fstep snr
A N 101 0 2500 2500 4000 100 7
B N 102 -1000 2500 2500 4000 100 7
"""
    chans = parse_sdr_param(text)
    assert len(chans) == 2
    assert chans[0].physical == "A" and chans[1].fc_init_hz == -1000.0


def test_acquire_and_track_two_prns(small_cfg, two_prn_capture):
    fs = int(small_cfg.fs)
    rx = Receiver([small_chan(9), small_chan(27)], fs=small_cfg.fs)
    stream = two_prn_capture
    reports = []
    for s in range(4):
        seg = stream[s * fs : (s + 1) * fs + 2 * small_cfg.samples_per_code]
        reports.append(rx.process_second({"A": seg}))
    # second 0: acquisition; second 1: first lock; seconds 2+: reports
    r_a = reports[3][0]
    r_b = reports[3][1]
    assert r_a is not None and r_a.locked
    assert r_b is not None and r_b.locked
    # carrier frequency recovered to mHz once the phase-slope loop has
    # converged (the conjugate-phase sign fix makes fc+df exact)
    assert abs(r_a.fc_hz - 120.0) < 0.05, r_a.fc_hz
    assert abs(r_b.fc_hz - (-210.0)) < 0.05, r_b.fc_hz
    # code phase (ns) near the injected delays (1 sample = 1e4 ns here)
    assert abs(r_a.gd_ns - 137.0 * 1e9 / small_cfg.fs) < 2e3, r_a.gd_ns
    assert abs(r_b.gd_ns - 555.0 * 1e9 / small_cfg.fs) < 2e3, r_b.gd_ns
    assert r_a.cnt > 25  # most of the 49 tracked codes valid


def test_lock_loss_on_signal_drop(small_cfg):
    fs = int(small_cfg.fs)
    (stream,) = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=60.0, doppler_hz=80.0, amplitude=1200,
                    noise_sigma=100)],
        n_seconds=3,
        seed=4,
    )
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 100, 2 * fs) + 1j * rng.normal(0, 100, 2 * fs)
    rx = Receiver([small_chan(9)], fs=small_cfg.fs)
    L = small_cfg.samples_per_code
    rx.process_second({"A": stream[: fs + 2 * L]})  # acquire
    assert rx.states[0].is_trk
    rx.process_second({"A": stream[fs : 2 * fs + 2 * L]})  # first lock
    # now feed pure noise -> lock lost
    rx.process_second({"A": noise[: fs + 2 * L]})
    assert not rx.states[0].is_trk
    assert any("lock lost" in line for line in rx.log)


def test_parse_sdr_param_sic_flag():
    chans = parse_sdr_param("A S 101 0 2500 2500 4000 100 7\n")
    assert chans[0].is_sic


def test_sic_recovers_weak_cochannel_prn(small_cfg):
    """SIC/MAI cancellation (rxcomplex.cpp:506-520, disabled there): a weak
    PRN buried 27 dB under a strong co-channel PRN acquires only after the
    strong channel is tracked and subtracted."""
    import dataclasses

    fs = int(small_cfg.fs)
    cfg_b = dataclasses.replace(small_cfg, taps=27)
    streams = synthesize_capture(
        small_cfg,
        [ChannelSim(delay_samples=137.0, doppler_hz=120.0, amplitude=2500,
                    noise_sigma=40)],
        n_seconds=7,
        seed=5,
        extra_emissions=[
            (cfg_b, ChannelSim(delay_samples=555.0, doppler_hz=-210.0,
                               amplitude=110, noise_sigma=0.0))
        ],
    )
    stream = streams[0]

    def run(weak_sic: bool):
        rx = Receiver(
            [small_chan(9), small_chan(27, fc=0.0, is_sic=weak_sic)],
            fs=small_cfg.fs,
        )
        last_weak = None
        for s in range(6):
            seg = stream[s * fs : (s + 1) * fs + 2 * small_cfg.samples_per_code]
            rep = rx.process_second({"A": seg})
            if rep[1] is not None:
                last_weak = rep[1]
        return rx, last_weak

    rx_sic, weak = run(True)
    assert weak is not None and weak.locked, rx_sic.log
    assert any("SIC" in line for line in rx_sic.log)
    # code phase of the weak PRN recovered (1 sample = 1e4 ns here)
    assert abs(weak.gd_ns - 555.0 * 1e9 / fs) < 0.2 * 1e9 / fs, weak
    assert abs(weak.fc_hz - (-210.0)) < 1.0

    # without SIC the weak channel never produces a locked report
    rx_plain, weak_plain = run(False)
    assert weak_plain is None, (weak_plain, rx_plain.log)


def test_build_channels_batch_matches_build_channel(small_cfg):
    """The vectorized bank build reproduces build_channel per channel
    (wav/fcode/psbb to f32 roundoff, chips exactly), including
    heterogeneous filter cut-offs and shared taps."""
    import numpy as np

    from amaranth_twstft_tpu.models.dllpll import (
        build_channel,
        build_channels_batch,
    )

    fs = small_cfg.fs
    import dataclasses

    cfgs = [
        small_chan(9),
        small_chan(27),
        # different mask, same code
        dataclasses.replace(small_chan(9), filter_hz=2e4),
    ]
    batch = build_channels_batch(cfgs, fs)
    for cfg, ch in zip(cfgs, batch):
        ref = build_channel(cfg, fs)
        assert ch.nobs == ref.nobs
        np.testing.assert_allclose(ch.wav, ref.wav, atol=2e-5)
        assert abs(ch.psbb - ref.psbb) < 1e-5
        np.testing.assert_allclose(ch.fcode, ref.fcode, atol=2e-2)
        assert np.array_equal(ch.chips, ref.chips)
        assert np.array_equal(ch.code_interp, ref.code_interp)


def test_bank_disk_cache_roundtrip(small_cfg, tmp_path, monkeypatch):
    """The on-disk replica-bank cache returns the built arrays exactly
    (wav/chips bit-identical, fcode/psbb to storage roundoff) and the
    prn_id/physical metadata follows the CALLER's cfgs, not the cached
    ones (array identity is keyed only on geometry+taps+filter+fs)."""
    import dataclasses

    import numpy as np

    from amaranth_twstft_tpu.models.dllpll import build_channels_batch
    from amaranth_twstft_tpu.ops.lfsr import find_mseq_taps

    monkeypatch.setenv("TWSTFT_BANK_CACHE", str(tmp_path))
    fs = small_cfg.fs
    taps = find_mseq_taps(small_cfg.bit_len, 8)
    cfgs = [
        dataclasses.replace(
            small_chan(int(taps[i])), prn_id=50 + i,
            physical="A" if i % 2 == 0 else "B",
        )
        for i in range(8)
    ]
    a = build_channels_batch(cfgs, fs)
    assert any(p.suffix == ".npz" for p in tmp_path.iterdir())
    # second call loads from disk; different metadata, same arrays
    cfgs2 = [dataclasses.replace(c, prn_id=c.prn_id + 100) for c in cfgs]
    b = build_channels_batch(cfgs2, fs)
    for x, y in zip(a, b):
        assert y.cfg.prn_id == x.cfg.prn_id + 100
        assert np.array_equal(x.wav, y.wav)
        assert np.array_equal(x.chips, y.chips)
        np.testing.assert_allclose(x.fcode, y.fcode, atol=1e-4)
        assert abs(x.psbb - y.psbb) < 1e-9
    # a corrupt cache entry falls back to a rebuild
    for p in tmp_path.iterdir():
        p.write_bytes(b"garbage")
    c = build_channels_batch(cfgs, fs)
    np.testing.assert_allclose(a[0].wav, c[0].wav, atol=2e-5)
