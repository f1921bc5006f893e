"""Mixed-radix FFT as MXU matmul stages — the TPU fast path for the
reference's "awkward" transform lengths.

The production code length is 100 000 chips x 2 samples/chip = 200 000 =
2^6 * 5^5 samples (``flashZedBoard.py:229-231``, ``godual_ranging.m:4-5``).
XLA's TPU FFT handles powers of two well but falls off a cliff on large
radix-5 factors (measured on v5e: 49 ms for a (50, 200000) c64 FFT vs
6.6 ms zero-padded to 2^18 — 7.5x slower than a *bigger* transform).
Since the correlation must be circular at exactly L (zero-padding changes
the correlation lattice), we keep the length and change the algorithm:
Cooley-Tukey with the length factored into pieces <= ~128, each stage's
DFT done as an (..., n) x (n, n) matmul on the MXU with fp32 accumulation.

Cost: N * sum(factors) complex MACs (~1.9e7 for L=200000 with factors
[50, 50, 80]) — compute-trivial on the MXU; runtime is the few HBM passes
of the stage reshuffles.  Accuracy: each stage is a size-<=128 dense DFT
in fp32 — error ~sqrt(f)*eps per stage, ~1e-6 relative overall, on par
with an fp32 FFT.

``fft_factored`` is exact for any N whose prime factors fit the stage
budget (2, 3, 5 always do).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["good_factors", "fft_factored", "ifft_factored"]

_MAX_FACTOR = 128


def _prime_factors(n: int) -> list[int]:
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


@lru_cache(maxsize=None)
def _best_split(n: int, max_factor: int) -> tuple[int, ...] | None:
    """Factorization of n into parts <= max_factor: fewest parts first,
    then no part below 25 if avoidable (tiny factors make badly-shaped
    matmul stages — a trailing 16 measured 8x slower than balanced
    splits), then lexicographically-largest descending (big first stage
    measured fastest: (125,64,25) 5.0 ms vs (80,50,50) 6.5 ms at
    (50, 200000) c64 on v5e)."""
    if n == 1:
        return ()
    if n <= max_factor:
        return (n,)
    best = None
    for d in range(max_factor, 1, -1):
        if n % d:
            continue
        sub = _best_split(n // d, max_factor)
        if sub is None:
            continue
        cand = tuple(sorted((d,) + sub, reverse=True))
        key = (len(cand), min(cand) < 25, tuple(-c for c in cand))
        if best is None or key < best[0]:
            best = (key, cand)
    return None if best is None else best[1]


@lru_cache(maxsize=None)
def good_factors(n: int, max_factor: int = _MAX_FACTOR) -> tuple[int, ...]:
    """Stage sizes for :func:`fft_factored`: fewest (= fewest HBM passes),
    balanced (largest minimum factor), largest stage first."""
    primes = sorted(_prime_factors(n))
    if primes and primes[-1] > max_factor:
        raise ValueError(
            f"N={n} has prime factor {primes[-1]} > {max_factor}; "
            "use the XLA FFT for this length"
        )
    split = _best_split(n, max_factor)
    assert split is not None
    return split


def _dft_matrix(n: int, inverse: bool) -> np.ndarray:
    k = np.arange(n)
    sign = 2j if inverse else -2j
    return np.exp(sign * np.pi * np.outer(k, k) / n)


def _twiddle(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """W_{n1*n2}^{k1*n2'} of the Cooley-Tukey split, shape (n1, n2)."""
    sign = 2j if inverse else -2j
    return np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / (n1 * n2))


def _ct(x: jax.Array, factors: tuple[int, ...], inverse: bool,
        np_dtype) -> jax.Array:
    """Recursive Cooley-Tukey over the last axis (no normalization)."""
    n = x.shape[-1]
    f = factors[0]
    m = jnp.asarray(_dft_matrix(f, inverse).astype(np_dtype))
    # precision="high" (3-pass bf16): TPU f32 dots otherwise run as
    # 1-pass bf16 (~8 mantissa bits) — measured max rel error of the
    # full staged transform on v5e: default 6.1e-3, high 3.5e-5,
    # highest 1.7e-7.  "high" keeps the END-TO-END delay parity at the
    # measured few-ps level (tools/tpu_parity_probe.py) at half the
    # MXU passes of "highest"; the peak-value window and lag-bank sums
    # stay at "highest" (their outputs are read directly as estimates).
    if len(factors) == 1:
        return jnp.einsum(
            "...a,ab->...b", x, m,
            preferred_element_type=x.dtype, precision="high",
        )
    n2 = n // f
    xr = x.reshape(x.shape[:-1] + (f, n2))  # [n1, n2], n = n2*n1_ + n2_
    # DFT over n1 (axis -2): A[k1, n2]
    a = jnp.einsum("...ab,ad->...db", xr, m, preferred_element_type=x.dtype,
                   precision="high")
    tw = jnp.asarray(_twiddle(f, n2, inverse).astype(np_dtype))
    a = a * tw
    # remaining transform over n2 (last axis) for each k1
    y = _ct(a, factors[1:], inverse, np_dtype)  # [k1, k2]
    # X[k1 + n1*k2] -> k2-major flatten
    return jnp.swapaxes(y, -1, -2).reshape(x.shape[:-1] + (n,))


@partial(jax.jit, static_argnames=("inverse",))
def fft_factored(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Drop-in ``jnp.fft.fft`` (last axis) for MXU-friendly lengths.

    Matches ``jnp.fft.fft`` / ``jnp.fft.ifft`` (including the 1/N inverse
    normalization) to fp rounding.
    """
    n = x.shape[-1]
    factors = good_factors(n)
    np_dtype = np.complex128 if x.dtype == jnp.complex128 else np.complex64
    x = x.astype(np_dtype)
    y = _ct(x, factors, inverse, np_dtype)
    if inverse:
        y = y / n
    return y


def ifft_factored(x: jax.Array) -> jax.Array:
    return fft_factored(x, inverse=True)
