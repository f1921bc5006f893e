"""Lag-bank correlation — Pallas MXU kernel for the DLL/PLL hot loop.

The reference's tracking receiver correlates one second of samples
against (2*nlag+1) shifted replica copies for up to 120 channels with one
DGEMM per channel per second (``experiments/231001_DLL_PLL/
rxcomplex.cpp:605``): a (codes, nobs) x (nobs, nlags) contraction with a
huge K dimension (~4e5) and tiny M/N, followed by per-element power and
phase.  The Pallas kernel tiles K across the grid, accumulates re/im
partial products in VMEM scratch, and fuses the power/phase epilogue into
the final grid step — the (codes, nlags) intermediates never round-trip
to HBM (power = 0.5*(re^2+im^2), phase = atan2(-im, re)/2pi,
``rxcomplex.cpp:628-663``).

CPU fallback: the same contraction as two jnp dots (XLA handles this
fine on host; Pallas TPU kernels only run interpreted there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lag_bank_correlate", "lag_bank_pallas"]

_K_CHUNK = 2048


def _pad_to(x: np.ndarray | jax.Array, axis: int, mult: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(obs_ref, wav_ref, pow_ref, ph_ref, acc_re, acc_im):
    import jax.experimental.pallas as pl

    k = pl.program_id(0)
    nk = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        acc_re[...] = jnp.zeros_like(acc_re)
        acc_im[...] = jnp.zeros_like(acc_im)

    wav = wav_ref[...]  # (Kc, NL)
    acc_re[...] += jnp.dot(
        obs_ref[0], wav, preferred_element_type=jnp.float32,
        precision="highest",
    )
    acc_im[...] += jnp.dot(
        obs_ref[1], wav, preferred_element_type=jnp.float32,
        precision="highest",
    )

    @pl.when(k == nk - 1)
    def _():
        re = acc_re[...]
        im = acc_im[...]
        pow_ref[...] = 0.5 * (re * re + im * im)
        # atan2 is not lowerable in Pallas TPU; emit re/im and let the
        # caller take the (C, NL)-tiny phase outside the kernel.
        ph_ref[0] = re
        ph_ref[1] = im


@partial(jax.jit, static_argnames=("interpret", "k_chunk"))
def lag_bank_pallas(
    obs_ri: jax.Array,
    wav_lags: jax.Array,
    interpret: bool = False,
    k_chunk: int = _K_CHUNK,
):
    """Pallas lag-bank correlate: (2, C, K) x (K, NL) -> power, phase.

    Inputs are padded to MXU-friendly tiles (C to 8, NL to 128, K to the
    chunk); zero padding contributes nothing to the contraction.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, c0, k0 = obs_ri.shape
    nl0 = wav_lags.shape[-1]
    obs = _pad_to(_pad_to(obs_ri.astype(jnp.float32), 1, 8), 2, k_chunk)
    wav = _pad_to(_pad_to(wav_lags.astype(jnp.float32), 0, k_chunk), 1, 128)
    _, c, k = obs.shape
    nl = wav.shape[-1]
    nk = k // k_chunk

    power, reim = pl.pallas_call(
        _kernel,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec(
                (2, c, k_chunk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_chunk, nl), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((c, nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, c, nl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, nl), jnp.float32),
            jax.ShapeDtypeStruct((2, c, nl), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, nl), jnp.float32),
            pltpu.VMEM((c, nl), jnp.float32),
        ],
        interpret=interpret,
    )(obs, wav)
    phase = jnp.arctan2(-reim[1], reim[0]) / (2.0 * np.pi)
    return power[:c0, :nl0], phase[:c0, :nl0]


@jax.jit
def _lag_bank_jnp(obs_ri: jax.Array, wav_lags: jax.Array):
    re = jnp.dot(obs_ri[0], wav_lags, preferred_element_type=jnp.float32,
                 precision="highest")
    im = jnp.dot(obs_ri[1], wav_lags, preferred_element_type=jnp.float32,
                 precision="highest")
    power = 0.5 * (re * re + im * im)
    phase = jnp.arctan2(-im, re) / (2.0 * jnp.pi)
    return power, phase


def lag_bank_correlate(obs_ri, wav_lags, use_pallas: bool = False):
    """Power/phase lag bank.

    SIGN CONVENTION: ``phase`` is ``atan2(-im, re)`` — the reference
    DGEMM epilogue's convention (``rxcomplex.cpp:1070``), which is the
    CONJUGATE of the residual carrier phase under an ``exp(-j2πft)``
    downconversion.  A carrier loop fitting this phase's slope must
    negate it first or ``fc += round(slope)`` diverges (the receivers in
    ``models/dllpll.py`` / ``models/tracker.py`` do; see PARITY.md
    deviation 8).

    Default is the plain XLA contraction: measured at production DLL/PLL
    geometry ((2,48,4e5) x (4e5,57) on v5e) XLA's dots run 1.56 ms vs
    2.6 ms for the Pallas K-tiled kernel — XLA's K-split scheduling beats
    the hand pipeline here, so Pallas stays opt-in (`use_pallas=True`)
    rather than the default.
    """
    if use_pallas:
        interpret = jax.devices()[0].platform == "cpu"
        return lag_bank_pallas(obs_ri, wav_lags, interpret=interpret)
    return _lag_bank_jnp(obs_ri, wav_lags)
