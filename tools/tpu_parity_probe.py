"""End-to-end TPU delay parity vs the float64 oracle through the real
pipeline: per-epoch fractional delays, f16 and int8 ingest modes.

NOTE: promoted to a per-round regression in ``tests_tpu/`` (run by
``bench.py`` on the chip); this standalone probe remains for longer
ad-hoc runs (more epochs, custom modes).

Source of the on-device numbers in PARITY.md deviation 10 (f16 p99
2.8 ps, int8 p99 10.4 ps at -13 dB, production geometry).  Run on the
axon TPU: ``python tools/tpu_parity_probe.py`` (waits for the tunnel)."""
import os, sys, time, tempfile
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import wait_for_tunnel
import jax, jax.numpy as jnp
if not wait_for_tunnel(1500):
    print("tunnel dark, giving up"); sys.exit(1)
from amaranth_twstft_tpu.utils.platform import enable_compile_cache
enable_compile_cache()
from amaranth_twstft_tpu import pipeline
from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig
from amaranth_twstft_tpu.ops.lfsr import prn_chips, write_prn_file
from amaranth_twstft_tpu.ops.prn import chips_to_pm1, hamming, upsample_zoh

cfg = SignalConfig(); L = cfg.samples_per_code
chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
code64 = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip), np.float64)
spec = np.fft.fft(code64)
HAM = hamming(L)
k = np.fft.fftfreq(L)
rng = np.random.default_rng(42)
n_sec, eps = 8, 25   # 200 epochs
B = n_sec*eps
fracs = rng.uniform(0, 1, B)
td = tempfile.mkdtemp()
cap, codep = os.path.join(td,"cap.bin"), os.path.join(td,"code.bin")
write_prn_file(codep, cfg.bit_len, cfg.code_len, cfg.taps)
frames = np.empty((B*L, 4), np.int16)
for i in range(B):
    s = np.fft.ifft(spec*np.exp(-2j*np.pi*k*(1234+fracs[i])))
    z1 = 800*s + rng.normal(0,300,L) + 1j*rng.normal(0,300,L)
    z2 = 2000*np.fft.ifft(spec*np.exp(-2j*np.pi*k*(56+fracs[i]))) + rng.normal(0,150,L) + 1j*rng.normal(0,150,L)
    sl = slice(i*L,(i+1)*L)
    frames[sl,0] = np.clip(np.round(z1.real),-32768,32767)
    frames[sl,1] = np.clip(np.round(z1.imag),-32768,32767)
    frames[sl,2] = np.clip(np.round(z2.real),-32768,32767)
    frames[sl,3] = np.clip(np.round(z2.imag),-32768,32767)
frames.tofile(cap)
print("capture written", flush=True)

def oracle(sig, df):
    t = np.arange(L)/cfg.fs
    y = (sig - sig.mean()) * np.exp(-2j*np.pi*df*t)
    prod = np.fft.fft(y) * np.conj(spec) * HAM
    M = 3*L
    z = np.zeros(M, complex); z[:L//2] = prod[:L//2]; z[-(L//2):] = prod[L//2:]
    pm = np.fft.ifft(z); a = np.abs(pm); i0 = int(a.argmax())
    am1,a0,ap1 = a[(i0-1)%M], a[i0], a[(i0+1)%M]
    return (i0 + 0.5*(am1-ap1)/(am1+ap1-2*a0))/3.0

proc = ProcessingConfig(hamming_window=True)
res = {}
for mode in ("float16", "int8"):
    t0=time.time()
    out = pipeline.process_capture_overlapped(cap, codep, cfg, proc,
        batch_epochs=125, ingest_dtype=mode, out_mat=os.path.join(td,f"o_{mode}.mat"))
    d_t = (np.asarray(out["ch1"]["indice"]) + np.asarray(out["ch1"]["correction"]))/3.0
    res[mode] = (d_t, float(out["df"][0]), time.time()-t0)
    print(f"{mode}: pipeline {res[mode][2]:.0f}s df={out['df'][0]:.4f}", flush=True)

mm = np.memmap(cap, dtype=np.int16, mode="r", shape=(B*L,4))
for mode,(d_t,df,_) in res.items():
    t0=time.time()
    d_or = np.empty(B)
    for i in range(B):
        sl = np.asarray(mm[i*L:(i+1)*L, :2]).astype(np.float64)
        d_or[i] = oracle(sl[:,0] + 1j*sl[:,1], df)
    err = np.abs(d_t - d_or)*(1e9/cfg.fs)*1e3
    print(f"TPU {mode} vs f64 oracle (B={B}, -13 dB, oracle {time.time()-t0:.0f}s): "
          f"p50 {np.percentile(err,50):.2f} p90 {np.percentile(err,90):.2f} "
          f"p99 {np.percentile(err,99):.2f} max {err.max():.2f} ps", flush=True)
