#!/usr/bin/env python
"""Measure per-program dispatch + fetch round-trip through the axon relay.

Small sizes first so partial output still informs when weather is bad.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from amaranth_twstft_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


@jax.jit
def trivial(x):
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # tiny first: fixed round-trip cost
    for shape, tag in [((8, 128), "tiny 4KB"),
                       ((50, 20000, 4), "small 8MB"),
                       ((50, 200000, 4), "big 80MB")]:
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float16))
        t0 = time.time()
        _ = np.asarray(trivial(x))
        log(f"{tag}: first (compile+run+fetch) {time.time()-t0:.2f}s")
        for i in range(3):
            t0 = time.time()
            x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float16))
            t1 = time.time()
            y = trivial(x)
            t2 = time.time()
            _ = np.asarray(y)
            t3 = time.time()
            log(f"{tag}[{i}]: h2d {t1-t0:.3f}s dispatch {t2-t1:.3f}s "
                f"fetch {t3-t2:.3f}s")

    # the real ranging step
    from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig
    from amaranth_twstft_tpu.models.godual import build_replica
    from amaranth_twstft_tpu.ops import boundary
    from amaranth_twstft_tpu.ops.lfsr import write_prn_file

    cfg = SignalConfig()
    code = "/tmp/probe_code.bin"
    if not os.path.exists(code):
        write_prn_file(code, cfg.bit_len, cfg.code_len, cfg.taps)
    proc = ProcessingConfig(hamming_window=True)
    rep = build_replica(code, cfg, proc, conjugate=True)
    B, L = 50, cfg.samples_per_code
    step = boundary.make_ranging_step(
        np.asarray(rep.fcode), np.asarray(rep.code_interp),
        np.ones(L, bool), cfg.fs, nint=proc.nint, packed=True)
    dfv = jnp.asarray(np.repeat(np.asarray([130.0, 5.0], np.float32), B))

    def fresh():
        return rng.normal(0, 300, (B, L, 4)).astype(np.float16)

    t0 = time.time()
    o = step(jnp.asarray(fresh()), df_fixed=dfv)
    _ = np.asarray(o)
    log(f"ranging compile+first: {time.time()-t0:.1f}s")
    for i in range(3):
        t0 = time.time()
        x = jnp.asarray(fresh())
        t1 = time.time()
        o = step(x, df_fixed=dfv)
        t2 = time.time()
        _ = np.asarray(o)
        t3 = time.time()
        log(f"ranging[{i}]: h2d {t1-t0:.3f}s dispatch {t2-t1:.3f}s "
            f"fetch {t3-t2:.3f}s")

    # pipelined depth-2 (the pipeline's actual pattern)
    t0 = time.time()
    pend = []
    for i in range(4):
        x = jnp.asarray(fresh())
        pend.append(step(x, df_fixed=dfv))
        if len(pend) > 1:
            _ = np.asarray(pend.pop(0))
    for p in pend:
        _ = np.asarray(p)
    log(f"ranging pipelined x4: {(time.time()-t0)/4:.3f}s per batch")

    # bigger batch: does per-batch cost scale with size or stay fixed?
    for B2 in (125, 250):
        step2 = boundary.make_ranging_step(
            np.asarray(rep.fcode), np.asarray(rep.code_interp),
            np.ones(L, bool), cfg.fs, nint=proc.nint, packed=True)
        dfv2 = jnp.asarray(np.repeat(np.asarray([130.0, 5.0], np.float32), B2))

        def fresh2():
            return rng.normal(0, 300, (B2, L, 4)).astype(np.float16)

        t0 = time.time()
        o = step2(jnp.asarray(fresh2()), df_fixed=dfv2)
        _ = np.asarray(o)
        log(f"ranging B={B2} compile+first: {time.time()-t0:.1f}s")
        for i in range(2):
            t0 = time.time()
            x = jnp.asarray(fresh2())
            t1 = time.time()
            o = step2(x, df_fixed=dfv2)
            _ = np.asarray(o)
            t3 = time.time()
            log(f"ranging B={B2}[{i}]: h2d {t1-t0:.3f}s exec+fetch "
                f"{t3-t1:.3f}s -> {B2*L*2/(t3-t0)/1e6:.1f} MS/s")


if __name__ == "__main__":
    main()
