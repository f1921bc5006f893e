"""On-device parity regressions (PARITY.md deviations 10-12).

These promote the hand-run ``tools/tpu_*_probe.py`` measurements to
regression checks executed on the real chip each round (bench.py runs
this directory in-process after its measurement passes, so the batch
shapes below hit the warm compile cache).
"""

import os
import time

import numpy as np
import pytest

#: epochs in the parity capture — small enough to keep tunnel traffic
#: bounded (~40-80 MB/mode), large enough for a meaningful p99
B_EPOCHS = 50
#: batch shape shared with bench.py's end-to-end runs (compile-cache hit)
BATCH_EPOCHS = 125


@pytest.fixture(scope="module")
def parity_capture(accel, prod_cfg, prod_code, tmp_path_factory):
    """Fractional-delay capture + f64 oracle delays, shared across
    transfer-format cases (the tools/tpu_parity_probe.py setup).
    tmp_path_factory so the ~80 MB capture is reclaimed — bench.py runs
    this suite every round and bare mkdtemp dirs would accrete."""
    code64, spec, ham = prod_code
    L = prod_cfg.samples_per_code
    k = np.fft.fftfreq(L)
    rng = np.random.default_rng(42)
    fracs = rng.uniform(0, 1, B_EPOCHS)
    td = str(tmp_path_factory.mktemp("parity"))
    cap = os.path.join(td, "cap.bin")
    codep = os.path.join(td, "code.bin")
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file

    write_prn_file(codep, prod_cfg.bit_len, prod_cfg.code_len, prod_cfg.taps)
    frames = np.empty((B_EPOCHS * L, 4), np.int16)
    for i in range(B_EPOCHS):
        s = np.fft.ifft(spec * np.exp(-2j * np.pi * k * (1234 + fracs[i])))
        z1 = 800 * s + rng.normal(0, 300, L) + 1j * rng.normal(0, 300, L)
        z2 = (2000 * np.fft.ifft(spec * np.exp(-2j * np.pi * k * 56.25))
              + rng.normal(0, 150, L) + 1j * rng.normal(0, 150, L))
        sl = slice(i * L, (i + 1) * L)
        frames[sl, 0] = np.clip(np.round(z1.real), -32768, 32767)
        frames[sl, 1] = np.clip(np.round(z1.imag), -32768, 32767)
        frames[sl, 2] = np.clip(np.round(z2.real), -32768, 32767)
        frames[sl, 3] = np.clip(np.round(z2.imag), -32768, 32767)
    frames.tofile(cap)
    return dict(td=td, cap=cap, code=codep, fracs=fracs, frames=frames)


def _oracle_delays(capd, prod_cfg, prod_code, df):
    """float64 GoRanging oracle per epoch (nint=1, Hamming)."""
    _, spec, ham = prod_code
    L = prod_cfg.samples_per_code
    frames = capd["frames"]
    out = np.empty(B_EPOCHS)
    for i in range(B_EPOCHS):
        sl = frames[i * L : (i + 1) * L, :2].astype(np.float64)
        sig = sl[:, 0] + 1j * sl[:, 1]
        t = np.arange(L) / prod_cfg.fs
        y = (sig - sig.mean()) * np.exp(-2j * np.pi * df * t)
        prod = np.fft.fft(y) * np.conj(spec) * ham
        M = 3 * L
        z = np.zeros(M, complex)
        z[: L // 2] = prod[: L // 2]
        z[-(L // 2):] = prod[L // 2 :]
        a = np.abs(np.fft.ifft(z))
        i0 = int(a.argmax())
        am1, a0, ap1 = a[(i0 - 1) % M], a[i0], a[(i0 + 1) % M]
        out[i] = (i0 + 0.5 * (am1 - ap1) / (am1 + ap1 - 2 * a0)) / 3.0
    return out


#: p99 bound per transfer format, ps — ~3x the measured on-device p99
#: (VERDICT r04 item 5; PARITY.md deviation 10: f16 2.4-2.8 ps, sc16
#: 2.5 ps, int8 10.4-11.9 ps across rounds; int8-pow2 coarsens the
#: quantization step <=2x -> 10.4-18 ps measured).  Tight enough that a
#: silent 3x regression FAILS the device suite, loose enough for
#: round-to-round noise.
P99_BOUND_PS = {"float16": 8.0, "int8": 36.0, "int8-pow2": 54.0,
                "sc16": 8.0}


@pytest.mark.parametrize("mode", ["int8", "int8-pow2", "sc16", "float16"])
def test_transfer_format_parity_vs_f64_oracle(
    mode, parity_capture, prod_cfg, prod_code, accel
):
    from amaranth_twstft_tpu import pipeline
    from amaranth_twstft_tpu.config import ProcessingConfig

    capd = parity_capture
    t0 = time.time()
    if mode == "int8-pow2":
        os.environ["TWSTFT_Q8_POW2"] = "1"
    try:
        out = pipeline.process_capture_overlapped(
            capd["cap"], capd["code"], prod_cfg,
            ProcessingConfig(hamming_window=True),
            batch_epochs=BATCH_EPOCHS,
            ingest_dtype=mode.split("-")[0],
            out_mat=os.path.join(capd["td"], f"o_{mode}.mat"),
        )
    finally:
        os.environ.pop("TWSTFT_Q8_POW2", None)
    d_t = (np.asarray(out["ch1"]["indice"])
           + np.asarray(out["ch1"]["correction"])) / 3.0
    df = float(out["df"][0])
    d_or = _oracle_delays(capd, prod_cfg, prod_code, df)
    err_ps = np.abs(d_t - d_or) * (1e9 / prod_cfg.fs) * 1e3
    p99 = float(np.percentile(err_ps, 99))
    print(f"\n[tpu] {mode}: p50 {np.percentile(err_ps, 50):.2f} "
          f"p99 {p99:.2f} max {err_ps.max():.2f} ps "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert p99 < P99_BOUND_PS[mode], (mode, p99)


def test_int8_df_prepass_matches_f32(parity_capture, prod_cfg, accel):
    """PARITY deviation-10 pre-pass audit (VERDICT r03 item 10): the
    int8-packed scale-free df pre-pass agrees with the f32 pre-pass on
    device to within one squaring bin."""
    import jax.numpy as jnp

    from amaranth_twstft_tpu.config import ProcessingConfig
    from amaranth_twstft_tpu.ops.doppler import (
        PREPASS_MAX_SAMPLES,
        bound_prepass_window,
        per_file_df_ri,
    )
    from amaranth_twstft_tpu.pipeline import _pack_prepass
    from amaranth_twstft_tpu.utils import io

    proc = ProcessingConfig(hamming_window=True)
    dec = bound_prepass_window(io.decimate_sc16(
        parity_capture["cap"], proc.df_decimation, channels=2,
        max_out=PREPASS_MAX_SAMPLES,
    ))
    n = dec.shape[-1]
    bin_hz = prod_cfg.fs / proc.df_decimation / n
    dfs = {}
    for dt in (np.float32, np.int8, np.int16):
        dfs[dt] = float(per_file_df_ri(
            jnp.asarray(_pack_prepass(dec[0], dt)), prod_cfg.fs,
            proc.df_decimation,
        ))
    print(f"\n[tpu] df pre-pass f32={dfs[np.float32]:.4f} "
          f"int8={dfs[np.int8]:.4f} int16={dfs[np.int16]:.4f} "
          f"(bin {bin_hz:.3f} Hz)", flush=True)
    assert abs(dfs[np.int8] - dfs[np.float32]) <= 2 * bin_hz + 1e-6
    assert abs(dfs[np.int16] - dfs[np.float32]) <= 1e-6  # exact pack


def test_mxufft_precision_vs_f64(accel, prod_cfg):
    """PARITY deviation-12 regression: the staged MXU FFT at L=200000
    under the precision policy (FFT stages at "high") stays within 1e-4
    relative of the float64 numpy FFT (measured 3.1e-5; the silent
    bf16-default failure mode this guards against is 6.1e-3 and
    invisible to CPU tests)."""
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops import mxufft

    L = prod_cfg.samples_per_code
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(4, L)) + 1j * rng.normal(size=(4, L)))
    ref = np.fft.fft(x)

    @jax.jit
    def f(v):
        z = jax.lax.complex(v[..., 0], v[..., 1])
        y = mxufft.fft_factored(z)
        return jnp.stack([y.real, y.imag], axis=-1)

    xa = np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    got_ri = np.asarray(f(jnp.asarray(xa)))
    got = got_ri[..., 0] + 1j * got_ri[..., 1]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"\n[tpu] mxufft max rel err vs f64: {rel:.2e}", flush=True)
    assert rel < 1e-4, rel


def test_nint4_bias_bound(accel, prod_cfg, prod_code):
    """PARITY deviation-11 regression: the nint=4 fine grid bounds the
    parabola S-curve bias to <60 ps at adversarial fractional delays
    (the reference's 3x grid carries +/-368 ps intrinsic bias)."""
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops.boundary import make_ranging_step
    from amaranth_twstft_tpu.ops.prn import interp_code

    code64, spec, _ = prod_code
    L = prod_cfg.samples_per_code
    k = np.fft.fftfreq(L)
    nint = 4
    R = 2 * nint + 1
    code3 = interp_code(code64.astype(np.float32), R).astype(np.float32)
    step = make_ranging_step(
        np.conj(np.asarray(spec).astype(np.complex64)), code3,
        np.ones(L, bool), prod_cfg.fs, nint=nint, packed=True,
    )
    # adversarial fractions: between-grid-point positions
    fracs = np.array([0.1, 0.25, 0.37, 0.5, 0.62, 0.83])
    frames = np.empty((len(fracs), L, 2), np.float32)
    for i, fr in enumerate(fracs):
        s = np.fft.ifft(spec * np.exp(-2j * np.pi * k * (1234 + fr)))
        frames[i, :, 0] = 3000 * s.real  # high SNR: bias-dominated
        frames[i, :, 1] = 3000 * s.imag
    from amaranth_twstft_tpu.ops.boundary import to_epoch_result, unpack_outputs

    out = unpack_outputs(np.asarray(step(
        jnp.asarray(frames),
        df_fixed=jnp.zeros(len(fracs), jnp.float32),
    )))
    res = to_epoch_result(out)
    d = (np.asarray(res.indice) + np.asarray(res.correction)) / R
    err_ps = np.abs(d - (1234 + fracs)) * (1e9 / prod_cfg.fs) * 1e3
    print(f"\n[tpu] nint=4 bias at fractions {fracs}: "
          f"max {err_ps.max():.1f} ps", flush=True)
    assert err_ps.max() < 60.0, err_ps


def test_tracker_bank_truth_on_device(accel):
    """DLL/PLL bank numerics ON THE CHIP: a 2-PRN small-geometry bank
    acquires and locks both channels and recovers the injected delays
    and Dopplers (the bench's tracking section measures throughput only;
    this asserts the solutions)."""
    import dataclasses

    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.models.dllpll import ChannelConfig
    from amaranth_twstft_tpu.models.emitter import ChannelSim, synthesize_capture
    from amaranth_twstft_tpu.models.tracker import BankedReceiver

    cfg = SignalConfig(fs=1e5, chip_rate=5e4, code_len=1000, bit_len=10,
                       taps=9)
    fs, L = int(cfg.fs), cfg.samples_per_code
    fs_ns = 1e9 / cfg.fs
    delays = {9: 137.0, 27: 555.0}
    dops = {9: 120.0, 27: -210.0}
    streams = synthesize_capture(
        cfg,
        [ChannelSim(delay_samples=delays[9], doppler_hz=dops[9],
                    amplitude=900, noise_sigma=120)],
        n_seconds=4, seed=17,
        extra_emissions=[
            (dataclasses.replace(cfg, taps=27),
             ChannelSim(delay_samples=delays[27], doppler_hz=dops[27],
                        amplitude=900, noise_sigma=0.0)),
        ],
    )
    stream = streams[0]

    def chan(taps):
        return ChannelConfig(
            physical="A", prn_id=100 + taps, bit_len=10, taps=taps,
            fc_init_hz=0.0, chip_rate=5e4, code_len=1000, filter_hz=5e4,
            acq_range_hz=500.0, acq_step_hz=50.0, snr_min_db=20.0, nlag=8,
        )

    rx = BankedReceiver([chan(9), chan(27)], fs=cfg.fs)
    reports = None
    for s in range(4):
        seg = stream[s * fs : (s + 1) * fs + 2 * L]
        reports = rx.process_second({"A": seg})
    for rep, taps in zip(reports, (9, 27)):
        assert rep is not None and rep.locked, (taps, rep)
        assert abs(rep.fc_hz - dops[taps]) < 2.0, (taps, rep.fc_hz)
        # tracked group delay modulo the code period vs injected truth
        exp_ns = (delays[taps] % L) * fs_ns
        got = rep.gd_ns % (L * fs_ns)
        err = min(abs(got - exp_ns), L * fs_ns - abs(got - exp_ns))
        print(f"\n[tpu] tracker PRN taps={taps}: gd {got:.1f} ns "
              f"(exp {exp_ns:.1f}), fc {rep.fc_hz:.2f} Hz "
              f"(exp {dops[taps]})", flush=True)
        assert err < 100.0, (got, exp_ns)  # 0.01 sample at this geometry
