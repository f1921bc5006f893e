#!/usr/bin/env python
"""Measure per-program dispatch + fetch round-trip through the axon relay.

Questions:
  1. What does dispatch+fetch of a TRIVIAL program cost (fixed overhead)?
  2. Does the cost scale with input bytes already resident vs fresh?
  3. Is queuing K programs then fetching cheaper/more expensive than
     strict dispatch-fetch-dispatch-fetch?
  4. Does the ranging step itself cost more than a trivial program on the
     same input shape?
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
    print(m, flush=True)


@jax.jit
def trivial(x):
    return jnp.sum(x, axis=(1, 2))  # (B, L, 4) -> (B,)


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    B, L = 50, 200000

    # fresh unique content each time (defeat relay dedup)
    def fresh():
        return rng.normal(0, 300, (B, L, 4)).astype(np.float16)

    # 1. trivial program round trips, strict serial
    x = jnp.asarray(fresh()); _ = np.asarray(trivial(x))
    for i in range(3):
        t0 = time.time()
        x = jnp.asarray(fresh())
        t1 = time.time()
        y = trivial(x)
        t2 = time.time()
        _ = np.asarray(y)
        t3 = time.time()
        log(f"trivial[{i}]: h2d {t1-t0:.3f}s dispatch {t2-t1:.3f}s "
            f"fetch {t3-t2:.3f}s")

    # 2. resident input, repeated execution (same program, same input)
    x = jnp.asarray(fresh())
    _ = np.asarray(trivial(x))
    t0 = time.time()
    for i in range(5):
        _ = np.asarray(trivial(x))
    log(f"trivial resident same-input x5: {(time.time()-t0)/5:.3f}s each")

    # 3. queue depth: dispatch K then fetch all
    xs = [jnp.asarray(fresh()) for _ in range(4)]
    for xx in xs:
        xx.block_until_ready()
    t0 = time.time()
    ys = [trivial(xx) for xx in xs]
    t1 = time.time()
    outs = [np.asarray(y) for y in ys]
    log(f"queue4 trivial: dispatch {t1-t0:.3f}s fetch-all {time.time()-t1:.3f}s")

    # 4. block_until_ready semantics
    x = jnp.asarray(fresh())
    t0 = time.time()
    y = trivial(x)
    y.block_until_ready()
    t1 = time.time()
    _ = np.asarray(y)
    log(f"block_until_ready {t1-t0:.3f}s then fetch {time.time()-t1:.3f}s")

    # 5. the real ranging step on the same shape
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
    step = boundary.make_ranging_step(
        np.asarray(rep.fcode), np.asarray(rep.code_interp),
        np.ones(L, bool), cfg.fs, nint=proc.nint, packed=True)
    dfv = jnp.asarray(np.repeat(np.asarray([130.0, 5.0], np.float32), B))
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

    # 6. ranging with queue depth 2 (the pipeline's actual pattern)
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


if __name__ == "__main__":
    main()
