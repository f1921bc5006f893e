#!/usr/bin/env python
"""TPU probe: squaring_df stage costs."""

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
    from amaranth_twstft_tpu.ops.doppler import _masked_argmax, window_mask
    from amaranth_twstft_tpu.ops.fftutils import fftfreq_shifted

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    B, L = 50, 200000
    fs = 5e6
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, 2)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))
    mask = jnp.asarray(window_mask(L, fs, -20e3, 20e3))
    freq = jnp.asarray(fftfreq_shifted(L, fs), jnp.float32)

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
        print(f"{name:44s} {dt*1e3:8.2f} ms/iter (compile {compile_s:.0f} s)",
              file=sys.stderr)

    F = (100, 50, 40)

    def full_df(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        d2 = mxufft._ct(d * d, F, False, np.complex64)
        sp = jnp.fft.fftshift(jnp.abs(d2), axes=-1)
        idx = _masked_argmax(sp, mask)
        return jnp.sum(freq[idx])

    def df_noshift(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        d2 = mxufft._ct(d * d, F, False, np.complex64)
        sp = jnp.abs(d2)
        m2 = jnp.fft.ifftshift(mask)  # rolled mask, no data roll
        idx = _masked_argmax(sp, m2)
        idx = jnp.mod(idx + L // 2, L)
        return jnp.sum(freq[idx])

    def square_fft_only(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        d2 = mxufft._ct(d * d, F, False, np.complex64)
        return jnp.sum(jnp.abs(d2))

    def shift_only(v, b):
        sp = jnp.fft.fftshift(v[..., 0] + b, axes=-1)
        return jnp.sum(sp)

    def argmax_only(v, b):
        idx = _masked_argmax(v[..., 0] + b, mask)
        return jnp.sum(freq[idx])

    timeit("squaring_df full (shift+mask argmax)", full_df)
    timeit("squaring_df no-shift variant", df_noshift)
    timeit("square+fft+abs only", square_fft_only)
    timeit("fftshift only", shift_only)
    timeit("masked argmax + freq gather only", argmax_only)


if __name__ == "__main__":
    main()
