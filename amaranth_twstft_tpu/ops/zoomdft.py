"""Sparse evaluation of the zero-padded (zoomed) inverse DFT.

The reference interpolates correlations 3x by zero-padding the product
spectrum and running a full (2*nint+1)*L-point inverse FFT
(``processing/Octave/godual_ranging.m:27``, ``processing/CPP/main.cpp:
289-304``), then reads back *a handful* of samples: the argmax
neighborhood, and one code-aligned sample for the SNR estimate
(``godual_ranging.m:38-48``, ``main.cpp:332-352``).

On TPU the right shape for "few outputs of a long zero-padded IFFT" is a
direct DFT evaluation at exactly the needed points:

- :func:`zoom_point` — one output sample per epoch, an O(L) elementwise
  reduction (replaces a whole M-point IFFT kept only for ``zc[s]``);
- :func:`fine_window` — a W-sample window around the (cheap, un-zoomed)
  coarse correlation peak, computed as an (B, L) x (L, W) matmul on the
  MXU with a per-epoch modular twiddle.  Values are *identical* to the
  corresponding samples of the full zoomed IFFT (same summation, same
  1/M scale); the only approximation of the fast correlator path is that
  the argmax is restricted to this window (see
  :func:`amaranth_twstft_tpu.ops.correlator.correlate_epochs`).

Phase index arithmetic is done modulo M in int32 with a 2048-split so the
products never exceed 2^31 (TPU has no int64 by default), keeping the
twiddle angles exact — the same trick as ``fftutils._mix_phasor_f32``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "zoom_positions",
    "zoom_gather",
    "zoom_point",
    "fine_window_matrix",
    "fine_window",
]

_SPLIT = 2048


def _mulmod(a: jax.Array, b: jax.Array, m: int) -> jax.Array:
    """(a * b) mod m for int32 arrays with a < 2^20 disassembled, b < m.

    Splits ``a = q*2048 + r`` so every intermediate product stays below
    2^31: requires ``2048 * m < 2^31`` (true for every signal geometry
    here: m <= (2*nint+1)*L ~ 6e5).
    """
    a = a.astype(jnp.int32)
    b = jnp.mod(b.astype(jnp.int32), m)
    q, r = a // _SPLIT, a % _SPLIT
    qb = jnp.mod(_SPLIT * b, m)  # < m, product < 2048*m < 2^31
    return jnp.mod(q * qb + r * b, m)  # q*qb < (m/2048)*m, r*b < 2048*m


def zoom_positions(L: int, nint: int) -> np.ndarray:
    """Index in the length-M zero-padded spectrum of each of the L input
    bins: bins [0, L/2) keep their place, bins [L/2, L) move to the end
    (``main.cpp:289-294``, :func:`ops.fftutils.spectral_zoom`)."""
    half = L // 2
    k = np.arange(L)
    return np.where(k < half, k, k + 2 * nint * L).astype(np.int64)


def zoom_gather(full: np.ndarray, L: int, nint: int) -> np.ndarray:
    """Sample a length-M spectrum at the zoom positions (host precompute,
    e.g. the interpolated-code spectrum of the SNR identity)."""
    return np.asarray(full)[zoom_positions(L, nint)]


def zoom_point(
    ffty: jax.Array,
    g: jax.Array,
    s: jax.Array,
    nint: int,
) -> jax.Array:
    """``ifft(spectral_zoom(ffty) * G)[s] / 1`` evaluated directly.

    Args:
      ffty: (..., L) complex product-spectrum factor.
      g: (L,) the other factor *already gathered at the zoom positions*
        (:func:`zoom_gather`); complex.
      s: (...,) int output sample index in [0, M).
      nint: zoom factor, M = (2*nint+1)*L.

    Returns ``zc[s]`` with the standard 1/M ifft normalization — exactly
    the sample the reference reads for the SNR mean (``godual_ranging.m:
    43-45``, ``main.cpp:332-336``), without materializing the other
    M-1 samples.
    """
    L = ffty.shape[-1]
    M = (2 * nint + 1) * L
    pos = jnp.asarray(zoom_positions(L, nint).astype(np.int32))
    ph = _mulmod(pos, s[..., None], M)  # (..., L) in [0, M)
    real_dtype = jnp.float64 if ffty.dtype == jnp.complex128 else jnp.float32
    ang = ph.astype(real_dtype) * real_dtype(2.0 * np.pi / M)
    tw = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    return jnp.sum(ffty * g * tw, axis=-1) / M


def fine_window_matrix(L: int, nint: int, width: int) -> np.ndarray:
    """Static (L, width) matrix E with E[k, w] = exp(2j*pi*f_k*(w - width//2)/M),
    f_k the signed frequency of input bin k.  ``fine_window`` computes the
    zoomed IFFT at offsets ``w - width//2`` around any center via one
    matmul with this matrix (complex128; cast to the compute dtype once
    at bind time)."""
    M = (2 * nint + 1) * L
    k = np.arange(L)
    f = np.where(k < L // 2, k, k - L).astype(np.float64)
    w = np.arange(width, dtype=np.float64) - width // 2
    return np.exp(2j * np.pi * np.outer(f, w) / M)


def fine_window(
    prod: jax.Array,
    center_coarse: jax.Array,
    ematrix_ri: jax.Array,
    nint: int,
) -> tuple[jax.Array, jax.Array]:
    """Zoomed-IFFT samples at fine indices ``(2*nint+1)*ci + w - W//2``.

    Args:
      prod: (..., L) product spectrum (before zero-padding).
      center_coarse: (...,) int coarse (un-zoomed) sample index ci.
      ematrix_ri: (L, W, 2) float re/im of :func:`fine_window_matrix`.
      nint: zoom factor.

    Returns ``(values, base)``: values (..., W) complex, equal to the full
    zoomed IFFT at fine indices ``base + w``, ``base = (2*nint+1)*ci -
    W//2`` (mod M).  Factorization: the fine index m = R*ci + (w - W//2)
    gives exp(2j*pi*pos_k*m/M) = exp(2j*pi*k*ci/L) * E[k, w] because
    pos_k = k (mod L) — the per-epoch part is an L-periodic twiddle, the
    offset part is the static matrix, and the contraction is an MXU
    matmul.
    """
    L = prod.shape[-1]
    R = 2 * nint + 1
    M = R * L
    W = ematrix_ri.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).squeeze(-1)
    ph = _mulmod(k, center_coarse[..., None], L)  # (..., L) in [0, L)
    real_dtype = jnp.float64 if prod.dtype == jnp.complex128 else jnp.float32
    ang = ph.astype(real_dtype) * real_dtype(2.0 * np.pi / L)
    z = prod * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))  # (..., L)
    zr, zi = jnp.real(z), jnp.imag(z)
    er = ematrix_ri[..., 0].astype(real_dtype)
    ei = ematrix_ri[..., 1].astype(real_dtype)
    # (..., L) @ (L, W) on the MXU; complex via 4 real contractions.
    # precision="highest": these sums ARE the interpolated peak values
    # the parabola reads — 1-pass bf16 (the TPU f32 default) would add
    # ~1e-4-sample correction noise invisible to the CPU-f32 studies.
    dot = lambda a, b: jnp.matmul(
        a, b, preferred_element_type=real_dtype, precision="highest"
    )
    out = jax.lax.complex(dot(zr, er) - dot(zi, ei), dot(zr, ei) + dot(zi, er))
    base = jnp.mod(R * center_coarse - W // 2, M)
    return out / M, base
