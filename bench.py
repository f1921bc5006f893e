#!/usr/bin/env python
"""Benchmark: full per-epoch correlator chain throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MS/s", "vs_baseline": N}

Baseline: the fastest reference implementation (C++/FFTW + 2 worker
pthreads) processes a 5 s dual-channel record (2 ch x 25 MS) in 13 s on an
Intel i5-3610ME — 3.846 MS/s of IQ samples through the full chain
(``experiments/221219_twoway/README.md:37``, BASELINE.md).  ``vs_baseline``
is our samples/s divided by that.

The benched step is the *complete* per-epoch pipeline at production signal
geometry (squaring-FFT Doppler estimate + mix + FFT + conj-code product +
3x zero-pad IFFT + parabolic peak + code-aligned SNR), not a bare FFT.
All device I/O is real-valued (axon relay constraint — see
``amaranth_twstft_tpu/ops/boundary.py``).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from amaranth_twstft_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from amaranth_twstft_tpu.config import SignalConfig
    from amaranth_twstft_tpu.ops.boundary import make_ranging_step, pack_complex
    from amaranth_twstft_tpu.ops.doppler import window_mask
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import (
        chips_to_pm1,
        code_spectrum,
        interp_code,
        upsample_zoh,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = SignalConfig()  # production: L=200000, 25 codes/s
    L = cfg.samples_per_code
    B = 50  # 2 s of epochs per step

    chips = prn_chips(cfg.bit_len, cfg.taps, cfg.code_len)
    code = chips_to_pm1(upsample_zoh(chips, cfg.samples_per_chip), np.float32)
    fcode = np.asarray(code_spectrum(code)).astype(np.complex64)
    code3 = interp_code(code, 3).astype(np.float32)
    mask = window_mask(L, cfg.fs, -20e3, 20e3)

    rng = np.random.default_rng(0)
    sig = 800 * np.roll(code, 1234).astype(np.complex64)[None, :]
    d_np = (
        sig
        + rng.normal(0, 200, (B, L)).astype(np.float32)
        + 1j * rng.normal(0, 200, (B, L)).astype(np.float32)
    ).astype(np.complex64)
    iq = jax.device_put(jnp.asarray(pack_complex(d_np)))

    step = make_ranging_step(fcode, code3, mask, cfg.fs, nint=1)

    t0 = time.time()
    out = step(iq)
    _ = np.asarray(out.indice)  # d2h is the only reliable sync on the relay
    print(f"compile+first run: {time.time()-t0:.1f} s", file=sys.stderr)

    # Run the whole iteration loop inside ONE program: iterations chain
    # through a data dependency (a bias derived from the previous output
    # folded into the input) so the device executes them sequentially,
    # and a single d2h fetch at the end is the sync.  Per-step host
    # dispatches through the axon relay cost ~15 ms each and would
    # dominate (measured 89 ms/step dispatched vs 17 ms/step looped).
    import jax

    iters = 20

    @jax.jit
    def run(iq):
        def body(_, carry):
            bias, acc = carry
            out = step(iq + bias * 1e-30)
            b2 = (
                jnp.sum(out.correction)
                + jnp.sum(out.snr_r)
                + jnp.sum(out.puissance)
            ).astype(jnp.float32)
            return (b2, acc + b2)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))

    t0 = time.time()
    _ = float(np.asarray(run(iq)[1]))
    compile2 = time.time() - t0
    t0 = time.time()
    _ = float(np.asarray(run(iq)[1]))
    dt = time.time() - t0
    print(f"loop compile {compile2:.1f} s", file=sys.stderr)
    samples_per_s = B * L * iters / dt

    out = step(iq)
    delay = out.delay_samples()[0]
    print(
        f"{iters} steps x {B} epochs in {dt:.3f} s -> "
        f"{samples_per_s/1e6:.1f} MS/s; delay check {delay:.3f} (exp ~1234); "
        f"snr {out.snr_db()[0]:.1f} dB",
        file=sys.stderr,
    )

    baseline = 50e6 / 13.0  # C++/FFTW: 5 s 2-ch record in 13 s
    print(
        json.dumps(
            {
                "metric": "correlator-chain IQ throughput (1 chip, full per-epoch pipeline)",
                "value": round(samples_per_s / 1e6, 2),
                "unit": "MS/s",
                "vs_baseline": round(samples_per_s / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
