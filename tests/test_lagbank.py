"""Pallas lag-bank kernel (interpret mode) vs the XLA-dot fallback."""

import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.ops.lagbank import (
    _lag_bank_jnp,
    lag_bank_correlate,
    lag_bank_pallas,
)


def test_pallas_matches_jnp(rng):
    c, k, nl = 6, 3000, 11  # deliberately unaligned (pads to 8/k_chunk/128)
    obs = rng.normal(size=(2, c, k)).astype(np.float32)
    wav = rng.normal(size=(k, nl)).astype(np.float32)
    pw, ph = lag_bank_pallas(
        jnp.asarray(obs), jnp.asarray(wav), interpret=True, k_chunk=1024
    )
    pw2, ph2 = _lag_bank_jnp(jnp.asarray(obs), jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(pw), np.asarray(pw2), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ph), np.asarray(ph2), rtol=1e-4, atol=1e-5
    )


def test_dispatch_cpu_uses_jnp(rng):
    obs = rng.normal(size=(2, 4, 256)).astype(np.float32)
    wav = rng.normal(size=(256, 5)).astype(np.float32)
    pw, ph = lag_bank_correlate(jnp.asarray(obs), jnp.asarray(wav))
    assert pw.shape == (4, 5) and ph.shape == (4, 5)
