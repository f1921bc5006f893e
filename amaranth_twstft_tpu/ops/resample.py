"""Polyphase FIR decimation front-end.

The reference decimates by plain sample-picking (every 25th sample,
``processing/CPP/main.cpp:776``) — aliasing is tolerated because the
squaring pre-pass only needs the strong line.  The TPU build's batch
front-end (BASELINE configs[3]) adds a proper anti-aliased polyphase
decimator: a windowed-sinc low-pass whose polyphase branches run as one
strided convolution, which XLA lowers onto the MXU.

Also provides :func:`pick_decimate` (the reference's exact behavior) so
the C++-chain parity path is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["design_lowpass", "polyphase_decimate", "pick_decimate"]


def design_lowpass(decim: int, taps_per_phase: int = 8,
                   beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc low-pass with cutoff 1/decim (normalized),
    length ``decim * taps_per_phase``, unit DC gain."""
    n = decim * taps_per_phase
    k = np.arange(n) - (n - 1) / 2.0
    h = np.sinc(k / decim) * np.kaiser(n, beta)
    return (h / h.sum()).astype(np.float64)


def pick_decimate(x, decim: int):
    """Every ``decim``-th sample — the reference's decimation
    (``main.cpp:776``), kept for numerical parity of the goranging df
    pre-pass."""
    return x[..., ::decim]


@partial(jax.jit, static_argnames=("decim",))
def polyphase_decimate(x: jax.Array, h: jax.Array, decim: int) -> jax.Array:
    """Anti-aliased decimation of complex IQ batches.

    ``x``: (..., N) complex; ``h``: FIR taps (multiple of ``decim``).
    Returns (..., N//decim) — y[m] = sum_k h[k] x[m*decim - k + offset]
    with zero padding ("same"-aligned so y[m] tracks x[m*decim]).
    Implemented as a strided 1-D convolution (one fused XLA conv per
    re/im part).
    """
    n = x.shape[-1]
    nh = h.shape[-1]
    lead = x.shape[:-1]
    xr = jnp.real(x).reshape((-1, 1, n))
    xi = jnp.imag(x).reshape((-1, 1, n))
    hk = h.astype(xr.dtype)[None, None, ::-1]
    # conv_general_dilated correlates; with the kernel flipped this is a
    # convolution, aligned so y[m] = sum_k h[k] x[m*D + (nh-1)//2 - k]
    # (np.convolve 'same' alignment on the pre-decimation grid).
    pad_lo = nh - 1 - (nh - 1) // 2
    pad_hi = nh - 1 - pad_lo

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, hk,
            window_strides=(decim,),
            padding=((pad_lo, pad_hi),),
            dimension_numbers=("NCH", "IOH", "NCH"),
        )

    yr = conv(xr)
    yi = conv(xi)
    out = jax.lax.complex(yr, yi).reshape(lead + (-1,))
    return out[..., : n // decim]
