#!/usr/bin/env python
"""Attribute the end-to-end epoch-loop cost per stage (VERDICT r02 item 1).

Stages measured independently over the same capture batches:
  read    — memmap disk read + int16->f16 convert (the prefetch thread's work)
  h2d     — jnp.asarray(batch) + block_until_ready
  compute — ranging_step_packed on resident data
  d2h     — np.asarray(outs) fetch

Then the real overlapped pipeline with a per-batch wall clock.
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

from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig
from amaranth_twstft_tpu.models.godual import build_replica
from amaranth_twstft_tpu.ops import boundary
from amaranth_twstft_tpu.ops.lfsr import write_prn_file
from amaranth_twstft_tpu.utils import io

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synthesize_capture_file  # noqa: E402


def log(m):
    print(m, flush=True)


def main():
    cfg = SignalConfig()
    scratch = "/tmp"
    n_seconds = int(os.environ.get("PROBE_SECONDS", "20"))
    cap = os.path.join(scratch, "probe_capture.bin")
    code = os.path.join(scratch, "probe_code.bin")
    write_prn_file(code, cfg.bit_len, cfg.code_len, cfg.taps)
    t0 = time.time()
    synthesize_capture_file(cap, cfg, n_seconds)
    log(f"synth {n_seconds}s ({os.path.getsize(cap)/1e9:.2f} GB) "
        f"in {time.time()-t0:.1f}s")

    proc = ProcessingConfig(hamming_window=True)
    rep = build_replica(code, cfg, proc, conjugate=True)
    L = rep.samples_per_code
    B = 50
    n_batches = n_seconds * 25 // B

    step = boundary.make_ranging_step(
        np.asarray(rep.fcode), np.asarray(rep.code_interp),
        np.ones(L, bool), cfg.fs, nint=proc.nint, packed=True,
    )
    dfv = jnp.asarray(np.repeat(np.asarray([130.0, 5.0], np.float32), B))

    # --- stage 1: disk read + convert (what the prefetch thread does) ---
    t0 = time.time()
    batches = []
    for i in range(n_batches):
        d, n = io.read_sc16_epochs_packed(
            cap, i * B * L, B, L, channels=2, dtype=np.float16)
        batches.append(d)
    t_read = time.time() - t0
    nbytes = sum(b.nbytes for b in batches)
    log(f"read+convert: {t_read:.2f}s for {nbytes/1e6:.0f} MB "
        f"({nbytes/t_read/1e6:.0f} MB/s)")

    # split: raw disk read vs convert
    t0 = time.time()
    mm = io.open_sc16(cap, 2)
    tot = 0
    for i in range(n_batches):
        raw = np.array(mm[i * B * L:(i + 1) * B * L])
        tot += raw.nbytes
    t_disk = time.time() - t0
    log(f"  raw disk read: {t_disk:.2f}s ({tot/t_disk/1e6:.0f} MB/s)")

    # --- stage 2: h2d of those batches ------------------------------
    xb = jnp.asarray(batches[0])
    xb.block_until_ready()
    t0 = time.time()
    devs = []
    for b in batches:
        devs.append(jnp.asarray(b))
    for d in devs:
        d.block_until_ready()
    t_h2d = time.time() - t0
    log(f"h2d: {t_h2d:.2f}s ({nbytes/t_h2d/1e6:.0f} MB/s)")

    # --- stage 3: compute on resident data ---------------------------
    outs = step(devs[0], df_fixed=dfv)
    outs.block_until_ready()
    t0 = time.time()
    res = [step(d, df_fixed=dfv) for d in devs]
    for r in res:
        r.block_until_ready()
    t_comp = time.time() - t0
    log(f"compute (resident): {t_comp:.2f}s "
        f"({n_batches*B*L*2/t_comp/1e6:.0f} MS/s)")

    # --- stage 4: d2h fetch ------------------------------------------
    t0 = time.time()
    for r in res:
        _ = np.asarray(r)
    t_d2h = time.time() - t0
    log(f"d2h fetch: {t_d2h:.2f}s")

    # --- h2d+compute chained per batch (no overlap) -------------------
    t0 = time.time()
    for b in batches:
        o = step(jnp.asarray(b), df_fixed=dfv)
        o.block_until_ready()
    t_chain = time.time() - t0
    log(f"h2d+compute chained: {t_chain:.2f}s")

    del batches, devs, res

    # --- the real overlapped pipeline, per-batch timed ----------------
    from amaranth_twstft_tpu import pipeline
    for r in range(2):
        t0 = time.time()
        out = pipeline.process_capture_overlapped(
            cap, code, cfg, proc, batch_epochs=B,
            out_mat=os.path.join(scratch, "probe_out.mat"))
        log(f"overlapped[{r}]: {time.time()-t0:.1f}s {out['timing']}")

    os.remove(cap)


if __name__ == "__main__":
    main()
