#!/usr/bin/env python
"""TPU probe: cut the df->mixer fusion pathology.

A: single program, optimization_barrier after squaring_df.
B: two chained programs (df program, then fixed-df correlator program).
C: current single program (control).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from amaranth_twstft_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.ops import doppler
    from amaranth_twstft_tpu.ops.boundary import ranging_step
    from amaranth_twstft_tpu.ops.correlator import correlate_epochs
    from amaranth_twstft_tpu.ops.doppler import squaring_df
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1, code_spectrum, interp_code, upsample_zoh,
    )
    from amaranth_twstft_tpu.ops.zoomdft import fine_window_matrix, zoom_gather
    from amaranth_twstft_tpu.ops.boundary import pack_complex

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = SignalConfig()
    B, L = 50, cfg.samples_per_code
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, 2)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))

    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip), np.float32)
    fcode = np.asarray(code_spectrum(code)).astype(np.complex64)
    code3_np = interp_code(code, 3).astype(np.float64)
    code3 = jnp.asarray(code3_np.astype(np.float32))
    fcode_ri = jnp.asarray(pack_complex(fcode))
    g_np = zoom_gather(np.conj(np.fft.fft(code3_np)), L, 1)
    g_ri = jnp.asarray(pack_complex(g_np.astype(np.complex64)))
    e = fine_window_matrix(L, 1, 32)
    fine_ri = jnp.asarray(np.stack([e.real, e.imag], -1).astype(np.float32))
    mask = jnp.asarray(doppler.window_mask(L, cfg.fs, -20e3, 20e3))

    def timeit(name, fn, iters=10, jit=False):
        f = jax.jit(fn) if jit else fn
        t0 = time.time()
        _ = float(np.asarray(f(xj, jnp.float32(0.0))))
        compile_s = time.time() - t0
        bias = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            bias = jnp.asarray(f(xj, bias * 1e-30), jnp.float32)
        _ = float(np.asarray(bias))
        dt = (time.time() - t0) / iters
        print(f"{name:46s} {dt*1e3:8.2f} ms/iter (compile {compile_s:.0f} s)",
              file=sys.stderr)

    @jax.jit
    def step_barrier(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        fc = jax.lax.complex(fcode_ri[..., 0], fcode_ri[..., 1])
        g = jax.lax.complex(g_ri[..., 0], g_ri[..., 1])
        df, _ = squaring_df(
            d - jnp.mean(d, axis=-1, keepdims=True), cfg.fs, mask,
            mxu_fft=True,
        )
        df = jax.lax.optimization_barrier(df)
        res = correlate_epochs(
            d, fc, df.astype(jnp.float32), code3, cfg.fs, nint=1,
            fcode_interp=g, fast=True, fine_matrix_ri=fine_ri, mxu_fft=True,
        )
        return jnp.sum(res.correction) + jnp.sum(res.snr_r)

    @jax.jit
    def prog_df(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        df, _ = squaring_df(
            d - jnp.mean(d, axis=-1, keepdims=True), cfg.fs, mask,
            mxu_fft=True,
        )
        return df

    def two_prog(v, b):
        df = prog_df(v, b)
        out = ranging_step(
            v, fcode_ri, code3, mask, df, cfg.fs, nint=1, use_mask=False,
            fcode_interp_ri=g_ri, fast=True, fine_matrix_ri=fine_ri,
            mxu_fft=True,
        )
        return jnp.sum(out.correction) + jnp.sum(out.snr_r)

    @jax.jit
    def control(v, b):
        out = ranging_step(
            v + b * 1e-30, fcode_ri, code3, mask, jnp.float32(0.0), cfg.fs,
            nint=1, use_mask=True, fcode_interp_ri=g_ri, fast=True,
            fine_matrix_ri=fine_ri, mxu_fft=True,
        )
        return jnp.sum(out.correction) + jnp.sum(out.snr_r)

    timeit("A: one program + optimization_barrier", step_barrier)
    timeit("B: two chained programs", two_prog)
    timeit("C: control (current single program)", control)


if __name__ == "__main__":
    main()
