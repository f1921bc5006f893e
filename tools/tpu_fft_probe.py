#!/usr/bin/env python
"""TPU microbenchmark: where does the per-epoch chain's time go?

Times (on the real chip) the building blocks at production geometry:
FFT/IFFT at L=200000 (mixed radix 2^6*5^5*... wait 200000=2^6*5^5? 64*3125
= 200000 yes) vs 2^18 padding, the mix phasor, the fine-window matmul and
the squaring-df step.  Chained data dependencies force sequential device
execution (block_until_ready does not truly sync through the axon relay).
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

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, L = 50, 200000

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, 2)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))

    def timeit(name, fn, iters=10):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(xj, jnp.float32(0.0))
        s = float(np.asarray(out))  # d2h sync
        compile_s = time.time() - t0
        bias = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            bias = f(xj, bias * 1e-30).astype(jnp.float32)
        s = float(np.asarray(bias))
        dt = (time.time() - t0) / iters
        print(f"{name:34s} {dt*1e3:8.2f} ms/iter  (compile {compile_s:.1f} s)",
              file=sys.stderr)
        return dt

    def fft_L(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)))

    def ifft_L(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        return jnp.sum(jnp.abs(jnp.fft.ifft(z, axis=-1)))

    def fft_pow2(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        z = jnp.pad(z, ((0, 0), (0, 262144 - L)))
        return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)))

    def fft_3L(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        z = jnp.pad(z, ((0, 0), (0, 2 * L)))
        return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)))

    def elementwise(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        k = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).squeeze(-1)
        ang = k.astype(jnp.float32) * jnp.float32(1e-3)
        lo = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        return jnp.sum(jnp.abs(z * lo))

    def finemm(v, b):
        # (B, L) x (L, 32) complex as 4 real matmuls
        zr = v[..., 0] + b
        zi = v[..., 1]
        er = jnp.ones((L, 32), jnp.float32) * 1e-4
        dot = lambda a, m: jnp.matmul(a, m, preferred_element_type=jnp.float32)
        return jnp.sum(dot(zr, er) - dot(zi, er)) + jnp.sum(dot(zr, er) + dot(zi, er))

    def argmax_mag(v, b):
        z = jax.lax.complex(v[..., 0] + b, v[..., 1])
        m = jnp.abs(z)
        return jnp.sum(jnp.argmax(m, axis=-1)).astype(jnp.float32)

    timeit("fft L=200000", fft_L)
    timeit("ifft L=200000", ifft_L)
    timeit("fft zero-padded to 2^18", fft_pow2)
    timeit("fft zero-padded to 3L=600000", fft_3L)
    timeit("elementwise phasor+mult+reduce", elementwise)
    timeit("fine matmul (L x 32)", finemm)
    timeit("abs+argmax", argmax_mag)


if __name__ == "__main__":
    main()
