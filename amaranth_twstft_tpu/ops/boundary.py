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
    "ranging_step_packed",
    "make_ranging_step",
    "to_epoch_result",
    "unpack_outputs",
    "on_accelerator",
]


def on_accelerator() -> bool:
    """True when the default JAX backend is not the host CPU — used by the
    file chains to route through the real-valued boundary layer (complex
    arrays cannot cross the axon TPU program boundary)."""
    import jax as _jax

    return _jax.devices()[0].platform != "cpu"


def pack_complex(z: np.ndarray, dtype=np.float32) -> np.ndarray:
    """complex (host) -> float (..., 2) for boundary crossing.

    ``dtype=np.float16`` halves the bytes over the tunnel (the jitted
    consumers cast back to f32 on device)."""
    out = np.empty(z.shape + (2,), dtype=dtype)
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


_RANGING_STATICS = (
    "fs", "nint", "conjugate_data", "use_mask", "fast", "mxu_fft",
    "fine_freq",
)


def _ranging_impl(
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
    scale: jax.Array = None,
) -> RangingOutputs:
    """One fused program: IQ f32 (B, L, 2) -> per-epoch estimates (real).

    ``use_mask=True``: per-epoch squaring-FFT df inside ``mask`` (the
    godual chain); ``False``: use ``df_fixed`` (broadcast) — the C++
    chain's fixed per-file df.  ``fcode_ri`` is the replica spectrum as
    (L, 2) float; ``fcode_interp_ri`` the conjugated interpolated-code
    spectrum ((2*nint+1)*L, 2) for the SNR identity.

    ``iq`` may be float16 (sc16 samples numerically converted: exact
    below 2048, <=2^-11 relative above — -66 dB quantization) or int8
    with a per-batch ``scale`` (q = round(x/scale), scale = max|x|/127 —
    HALF the bytes of f16/sc16 through the byte-rate-bound tunnel;
    quantization noise ~-38 dB below the RF noise floor, measured
    sub-ps delay impact in ``studies.f16_ingest_error_study``).  The
    cast to f32 (x scale) happens here, on device.
    """
    if iq.dtype == jnp.int8:
        if scale is None:
            raise ValueError(
                "int8 iq requires the per-batch dequantization scale "
                "(q = round(x/scale)); pass scale= to the step"
            )
        iq = iq.astype(jnp.float32) * scale.astype(jnp.float32)
    elif iq.dtype == jnp.int16:
        # sc16 wire format shipped raw ("ship the bytes, dequant on
        # device"): the cast is exact for every int16, so this mode is
        # bit-identical to float32 ingest at HALF the transfer bytes
        # and ZERO host conversion (utils/io.read_sc16_epochs_raw16)
        iq = iq.astype(jnp.float32)
    elif iq.dtype in (jnp.float16, jnp.bfloat16):
        iq = iq.astype(jnp.float32)
    if iq.shape[-1] == 4:
        # interleaved dual-channel ingest layout (n, L, 4) straight off
        # the sc16 file (utils/io.read_sc16_epochs_packed): deinterleave
        # on device into channel-major (2n, L, 2) — the host ships one
        # contiguous buffer and does no strided copies
        iq = jnp.concatenate([iq[..., 0:2], iq[..., 2:4]], axis=0)
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


ranging_step = partial(jax.jit, static_argnames=_RANGING_STATICS)(_ranging_impl)

#: Column order of the packed output row (see :func:`unpack_outputs`).
PACKED_FIELDS = (
    "indice", "correction", "df", "snr_r", "snr_i",
    "puissance", "puissance_code", "puissance_noise",
)
PACKED_WIDTH = len(PACKED_FIELDS) + 6  # + xval_ri [m1,0,p1] x [re,im]


def _flatten_outputs(out: RangingOutputs) -> jax.Array:
    cols = [getattr(out, f).astype(jnp.float32) for f in PACKED_FIELDS]
    xflat = out.xval_ri.reshape(out.xval_ri.shape[:-2] + (6,)).astype(
        jnp.float32
    )
    return jnp.concatenate([jnp.stack(cols, axis=-1), xflat], axis=-1)


@partial(jax.jit, static_argnames=_RANGING_STATICS)
def ranging_step_packed(
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
    scale: jax.Array = None,
) -> jax.Array:
    """:func:`ranging_step`, with every output flattened into ONE
    ``(..., 14)`` float32 array so the host pays a single d2h fetch per
    batch instead of nine (each fetch through the relay costs ~25-50 ms
    of fixed latency).  Decode with :func:`unpack_outputs`.  ``indice``
    rides as float32 — exact, since it is < 3L < 2^24."""
    return _flatten_outputs(_ranging_impl(
        iq, fcode_ri, code_interp, mask, df_fixed, fs,
        nint=nint, conjugate_data=conjugate_data, use_mask=use_mask,
        fcode_interp_ri=fcode_interp_ri, fast=fast,
        fine_matrix_ri=fine_matrix_ri, mxu_fft=mxu_fft, fine_freq=fine_freq,
        scale=scale,
    ))


def unpack_outputs(arr: np.ndarray) -> RangingOutputs:
    """Host-side decode of :func:`ranging_step_packed` rows back into a
    numpy-backed :class:`RangingOutputs`."""
    a = np.asarray(arr)
    kw = {f: a[..., i] for i, f in enumerate(PACKED_FIELDS)}
    kw["indice"] = kw["indice"].astype(np.int32)
    n = len(PACKED_FIELDS)
    kw["xval_ri"] = a[..., n : n + 6].reshape(a.shape[:-1] + (3, 2))
    return RangingOutputs(**kw)


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
    packed: bool = False,
):
    """Bind replica/mask once; return ``step(iq_f32, df_fixed=None)``.

    ``packed=True`` returns the single-array flattened outputs
    (:func:`ranging_step_packed`) — one d2h fetch per batch.

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
    if mxu_fft is None:
        mxu_fft = on_accelerator()
    if mxu_fft:
        from amaranth_twstft_tpu.ops.mxufft import good_factors

        try:
            good_factors(int(np.asarray(fcode).shape[-1]))
        except ValueError:
            mxu_fft = False  # length has a large prime factor
    from amaranth_twstft_tpu.ops.correlator import DEFAULT_FINE_WIDTH
    from amaranth_twstft_tpu.ops.zoomdft import fine_window_matrix, zoom_gather

    L = int(np.asarray(fcode).shape[-1])
    if packed and (2 * nint + 1) * L >= 2**24:
        # packed outputs ship indice as float32, exact only below 2^24;
        # (2*nint+1)*L beyond that would silently corrupt delay indices
        # (e.g. nint=2 with the 2.5 Mchip one-second code, L=5M)
        raise ValueError(
            f"packed outputs need (2*nint+1)*L < 2**24 to ship indice as "
            f"float32 exactly; got {(2 * nint + 1) * L} (nint={nint}, "
            f"L={L}) — use packed=False"
        )
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

    fn = ranging_step_packed if packed else ranging_step

    def step(iq: jax.Array, df_fixed=None, scale=None):
        sc = jnp.float32(1.0) if scale is None else jnp.asarray(
            scale, jnp.float32
        )
        if df_fixed is None:
            return fn(
                iq, fcode_ri, code3, mask_j, jnp.float32(0.0), fs,
                nint=nint, conjugate_data=conjugate_data, use_mask=True,
                fcode_interp_ri=fcode3_ri, fast=fast, fine_matrix_ri=fine_ri,
                mxu_fft=mxu_fft, fine_freq=fine_freq, scale=sc,
            )
        return fn(
            iq, fcode_ri, code3, mask_j, jnp.asarray(df_fixed, jnp.float32),
            fs, nint=nint, conjugate_data=conjugate_data, use_mask=False,
            fcode_interp_ri=fcode3_ri, fast=fast, fine_matrix_ri=fine_ri,
            mxu_fft=mxu_fft, fine_freq=fine_freq, scale=sc,
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
