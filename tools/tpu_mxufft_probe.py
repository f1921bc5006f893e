#!/usr/bin/env python
"""TPU probe: fft_factored stage costs and factor-order variants."""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from amaranth_twstft_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.ops import mxufft

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    B, L = 50, 200000
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, 2)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))

    def timeit(name, fn, iters=10):
        f = jax.jit(fn)
        t0 = time.time()
        _ = float(np.asarray(f(xj, jnp.float32(0.0))))
        compile_s = time.time() - t0
        bias = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            bias = f(xj, bias * 1e-30).astype(jnp.float32)
        _ = float(np.asarray(bias))
        dt = (time.time() - t0) / iters
        print(f"{name:40s} {dt*1e3:8.2f} ms/iter (compile {compile_s:.0f} s)",
              file=sys.stderr)

    def mk(factors, inverse=False):
        def fn(v, b):
            z = jax.lax.complex(v[..., 0] + b, v[..., 1])
            y = mxufft._ct(z, factors, inverse, np.complex64)
            return jnp.sum(jnp.abs(y))
        return fn

    for factors in [(125, 100, 16), (100, 50, 40), (80, 50, 50), (50, 50, 80),
                    (64, 125, 25), (125, 64, 25), (25, 125, 64)]:
        timeit(f"fft factors={factors}", mk(factors))

    timeit("ifft factors=(125,100,16)", mk((125, 100, 16), inverse=True))

    # full bound ranging step for breakdown reference
    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.ops.boundary import make_ranging_step
    from amaranth_twstft_tpu.ops.doppler import window_mask
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1, code_spectrum, interp_code, upsample_zoh,
    )

    cfg = SignalConfig()
    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip), np.float32)
    fcode = np.asarray(code_spectrum(code)).astype(np.complex64)
    code3 = interp_code(code, 3).astype(np.float32)
    mask = window_mask(cfg.samples_per_code, cfg.fs, -20e3, 20e3)

    step_nodf = make_ranging_step(fcode, code3, mask, cfg.fs)

    def fixed_df(v, b):
        out = step_nodf(v + b * 1e-30, df_fixed=0.0)
        return jnp.sum(out.correction) + jnp.sum(out.snr_r)

    timeit("ranging step, fixed df (no squaring)", fixed_df)


if __name__ == "__main__":
    main()
