#!/usr/bin/env python
"""TPU probe: masked vs fixed-df ranging step, and squaring_df pieces."""

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
    from amaranth_twstft_tpu.ops.boundary import make_ranging_step
    from amaranth_twstft_tpu.ops.fftutils import mix_phasor
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1, code_spectrum, interp_code, upsample_zoh,
    )

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = SignalConfig()
    B, L = 50, cfg.samples_per_code
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, 2)).astype(np.float32)
    xj = jax.device_put(jnp.asarray(x))

    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip), np.float32)
    fcode = np.asarray(code_spectrum(code)).astype(np.complex64)
    code3 = interp_code(code, 3).astype(np.float32)
    mask = doppler.window_mask(L, cfg.fs, -20e3, 20e3)
    step = make_ranging_step(fcode, code3, mask, cfg.fs)

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

    def masked(v, b):
        out = step(v + b * 1e-30)
        return jnp.sum(out.correction) + jnp.sum(out.snr_r)

    def fixed(v, b):
        out = step(v + b * 1e-30, df_fixed=0.0)
        return jnp.sum(out.correction) + jnp.sum(out.snr_r)

    def df_only(v, b):
        d = jax.lax.complex(v[..., 0] + b, v[..., 1])
        df, _ = doppler.squaring_df(
            d - jnp.mean(d, axis=-1, keepdims=True), cfg.fs,
            jnp.asarray(mask), mxu_fft=True,
        )
        return jnp.sum(df)

    def mix_per_epoch(v, b):
        dfs = jnp.sum(v[:, :4, 0], axis=-1) * 1e-9 + b  # (B,) traced
        lo = mix_phasor(L, dfs / cfg.fs, 1.0, dtype=jnp.complex64)
        return jnp.sum(jnp.abs(lo.real))

    timeit("ranging step, masked df", masked)
    timeit("ranging step, fixed df", fixed)
    timeit("squaring_df alone (mxu)", df_only)
    timeit("per-epoch mix_phasor (B ramps)", mix_per_epoch)


if __name__ == "__main__":
    main()
