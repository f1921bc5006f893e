"""TPU-safe program boundaries: real-valued I/O around complex kernels.

The axon-relayed TPU in the target deployment cannot move complex buffers
across program boundaries (h2d/d2h of complex, or fetching outputs of
complex-input programs, fails UNIMPLEMENTED).  Complex arithmetic *inside*
a jitted program is fully supported.  Every function here therefore takes
IQ as ``float32 (..., 2)`` / split re-im pairs and returns only real and
integer arrays; the complex work happens inside one fused program — which
is also simply good TPU practice (one compiled program per batch, no
boundary materialization).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.ops.correlator import correlate_epochs
from amaranth_twstft_tpu.ops.doppler import fine_df_phase_drift, squaring_df

__all__ = [
    "pack_complex",
    "unpack_complex",
    "RangingOutputs",
    "ranging_step",
    "make_ranging_step",
    "to_epoch_result",
    "on_accelerator",
]


def on_accelerator() -> bool:
    """True when the default JAX backend is not the host CPU — used by the
    file chains to route through the real-valued boundary layer (complex
    arrays cannot cross the axon TPU program boundary)."""
    import jax as _jax

    return _jax.devices()[0].platform != "cpu"


def pack_complex(z: np.ndarray) -> np.ndarray:
    """complex (host) -> float32 (..., 2) for boundary crossing."""
    out = np.empty(z.shape + (2,), dtype=np.float32)
    out[..., 0] = np.real(z)
    out[..., 1] = np.imag(z)
    return out


def unpack_complex(ri: np.ndarray) -> np.ndarray:
    """float (..., 2) (host) -> complex."""
    return np.asarray(ri[..., 0]) + 1j * np.asarray(ri[..., 1])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RangingOutputs:
    """All-real per-epoch outputs (safe to fetch from the TPU)."""

    indice: jax.Array  # int32
    correction: jax.Array
    df: jax.Array
    snr_r: jax.Array
    snr_i: jax.Array
    puissance: jax.Array
    puissance_code: jax.Array
    puissance_noise: jax.Array
    xval_ri: jax.Array  # (..., 3, 2): [m1, 0, p1] x [re, im]

    def delay_samples(self, interp_factor: int = 3) -> np.ndarray:
        return (np.asarray(self.indice) + np.asarray(self.correction)) / interp_factor

    def xval(self) -> np.ndarray:
        ri = np.asarray(self.xval_ri)
        return ri[..., 1, 0] + 1j * ri[..., 1, 1]

    def snr_db(self) -> np.ndarray:
        return 10.0 * np.log10(np.asarray(self.snr_r) + np.asarray(self.snr_i))


@partial(
    jax.jit,
    static_argnames=(
        "fs", "nint", "conjugate_data", "use_mask", "fast", "mxu_fft",
        "fine_freq",
    ),
)
def ranging_step(
    iq: jax.Array,
    fcode_ri: jax.Array,
    code_interp: jax.Array,
    mask: jax.Array,
    df_fixed: jax.Array,
    fs: float,
    nint: int = 1,
    conjugate_data: bool = False,
    use_mask: bool = True,
    fcode_interp_ri: jax.Array | None = None,
    fast: bool = False,
    fine_matrix_ri: jax.Array | None = None,
    mxu_fft: bool = False,
    fine_freq: bool = False,
) -> RangingOutputs:
    """One fused program: IQ f32 (B, L, 2) -> per-epoch estimates (real).

    ``use_mask=True``: per-epoch squaring-FFT df inside ``mask`` (the
    godual chain); ``False``: use ``df_fixed`` (broadcast) — the C++
    chain's fixed per-file df.  ``fcode_ri`` is the replica spectrum as
    (L, 2) float; ``fcode_interp_ri`` the conjugated interpolated-code
    spectrum ((2*nint+1)*L, 2) for the SNR identity.
    """
    d = jax.lax.complex(iq[..., 0], iq[..., 1])
    fcode = jax.lax.complex(fcode_ri[..., 0], fcode_ri[..., 1])
    fcode3 = None
    if fcode_interp_ri is not None:
        fcode3 = jax.lax.complex(fcode_interp_ri[..., 0], fcode_interp_ri[..., 1])
    if use_mask:
        df, _ = squaring_df(
            d - jnp.mean(d, axis=-1, keepdims=True), fs, mask, mxu_fft=mxu_fft
        )
    else:
        df = jnp.broadcast_to(df_fixed, d.shape[:-1])
    if fine_freq:
        # pyFFTW-chain refinement in the same fused program as the
        # coarse estimate (godual_ranging_fftw.py:35-39): mix by the
        # coarse df and fit the residual phase drift.
        t = jnp.arange(d.shape[-1], dtype=iq.dtype) / fs
        ang = -2.0 * jnp.pi * df[..., None] * t
        y = d * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        df = df + fine_df_phase_drift(y, fs)
    res = correlate_epochs(
        d,
        fcode,
        df.astype(iq.dtype),
        code_interp,
        fs,
        nint=nint,
        conjugate_data=conjugate_data,
        fcode_interp=fcode3,
        fast=fast,
        fine_matrix_ri=fine_matrix_ri,
        mxu_fft=mxu_fft,
    )
    xval_ri = jnp.stack(
        [
            jnp.stack([jnp.real(res.xvalm1), jnp.imag(res.xvalm1)], axis=-1),
            jnp.stack([jnp.real(res.xval), jnp.imag(res.xval)], axis=-1),
            jnp.stack([jnp.real(res.xvalp1), jnp.imag(res.xvalp1)], axis=-1),
        ],
        axis=-2,
    )
    return RangingOutputs(
        indice=res.indice,
        correction=res.correction,
        df=df,
        snr_r=res.snr_r,
        snr_i=res.snr_i,
        puissance=res.puissance,
        puissance_code=res.puissance_code,
        puissance_noise=res.puissance_noise,
        xval_ri=xval_ri,
    )


def make_ranging_step(
    fcode: np.ndarray,
    code_interp: np.ndarray,
    mask: np.ndarray,
    fs: float,
    nint: int = 1,
    conjugate_data: bool = False,
    fast: bool = True,
    fine_width: int | None = None,
    mxu_fft: bool | None = None,
    fine_freq: bool = False,
):
    """Bind replica/mask once; return ``step(iq_f32, df_fixed=None)``.

    The bound arrays are uploaded as real buffers; callers feed
    ``pack_complex``-ed IQ and read back :class:`RangingOutputs`.

    ``fast=True`` (default) uses the MXU windowed fine interpolation
    (:func:`ops.zoomdft.fine_window`) — ~2-3x faster at production L,
    identical results except for noise-tied peaks; the interpolated-code
    spectrum is pre-gathered at the zoom positions host-side so only
    O(L) constants are uploaded.

    ``mxu_fft=None`` auto-selects: matmul-staged transforms
    (:mod:`ops.mxufft`) on accelerators, XLA FFT on CPU.
    """
    import jax as _jax

    if mxu_fft is None:
        mxu_fft = _jax.devices()[0].platform != "cpu"
    if mxu_fft:
        from amaranth_twstft_tpu.ops.mxufft import good_factors

        try:
            good_factors(int(np.asarray(fcode).shape[-1]))
        except ValueError:
            mxu_fft = False  # length has a large prime factor
    from amaranth_twstft_tpu.ops.correlator import DEFAULT_FINE_WIDTH
    from amaranth_twstft_tpu.ops.zoomdft import fine_window_matrix, zoom_gather

    L = int(np.asarray(fcode).shape[-1])
    fcode_ri = jnp.asarray(pack_complex(np.asarray(fcode)))
    code3_np = np.asarray(code_interp, dtype=np.float64)
    code3 = jnp.asarray(code3_np.astype(np.float32))
    # SNR identity constant, pre-gathered at the zoom positions (L,).
    g_np = zoom_gather(np.conj(np.fft.fft(code3_np)), L, nint)
    fcode3_ri = jnp.asarray(pack_complex(g_np.astype(np.complex64)))
    mask_j = jnp.asarray(np.asarray(mask))
    fine_ri = None
    if fast:
        e = fine_window_matrix(L, nint, fine_width or DEFAULT_FINE_WIDTH)
        fine_ri = jnp.asarray(
            np.stack([e.real, e.imag], axis=-1).astype(np.float32)
        )

    def step(iq: jax.Array, df_fixed=None) -> RangingOutputs:
        if df_fixed is None:
            return ranging_step(
                iq, fcode_ri, code3, mask_j, jnp.float32(0.0), fs,
                nint=nint, conjugate_data=conjugate_data, use_mask=True,
                fcode_interp_ri=fcode3_ri, fast=fast, fine_matrix_ri=fine_ri,
                mxu_fft=mxu_fft, fine_freq=fine_freq,
            )
        return ranging_step(
            iq, fcode_ri, code3, mask_j, jnp.asarray(df_fixed, jnp.float32),
            fs, nint=nint, conjugate_data=conjugate_data, use_mask=False,
            fcode_interp_ri=fcode3_ri, fast=fast, fine_matrix_ri=fine_ri,
            mxu_fft=mxu_fft, fine_freq=fine_freq,
        )

    return step


def to_epoch_result(out: RangingOutputs):
    """Host-side adapter: :class:`RangingOutputs` (all-real, TPU-fetchable)
    back into the :class:`ops.correlator.EpochResult` shape the file
    chains accumulate (complex xval reassembled on host)."""
    from amaranth_twstft_tpu.ops.correlator import EpochResult

    ri = np.asarray(out.xval_ri)

    def mk(i):
        return ri[..., i, 0] + 1j * ri[..., i, 1]

    return EpochResult(
        indice=np.asarray(out.indice),
        correction=np.asarray(out.correction),
        xval=mk(1),
        xvalm1=mk(0),
        xvalp1=mk(2),
        snr_r=np.asarray(out.snr_r),
        snr_i=np.asarray(out.snr_i),
        puissance=np.asarray(out.puissance),
        puissance_code=np.asarray(out.puissance_code),
        puissance_noise=np.asarray(out.puissance_noise),
    )
