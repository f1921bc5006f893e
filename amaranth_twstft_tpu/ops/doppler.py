"""Frequency-offset (Doppler + LO offset) estimation.

A BPSK signal squared loses its modulation and exposes a spectral line at
twice the frequency offset — every reference chain exploits this:

- per-epoch: ``d2=fftshift(abs(fft(d.^2))); [~,df]=max(d2(k)); df=freq(df)/2``
  (``processing/Octave/godual_ranging.m:14-15``),
- per-file: one decimate-by-25 pre-pass fixing df for the whole record
  (``processing/CPP/main.cpp:363-450``),
- tracked: spectral-line candidates above 20x the median, each validated by
  a trial correlation SNR > 100, then a +/-3-bin refresh per block
  (``acquisition/claudio_aligned_code_ranging_separate.m:27-47,168-169``),
- fine: linear fit of the smoothed phase drift of the mixed signal
  (``experiments/221219_twoway/processing/godual_ranging_fftw.py:35-39``).

All estimators are dense/masked (no data-dependent shapes) so they batch
and jit cleanly on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.ops.correlator import quick_xcorr_snr
from amaranth_twstft_tpu.ops.fftutils import fftfreq_shifted

__all__ = [
    "window_mask",
    "squaring_spectrum",
    "squaring_df",
    "per_file_df",
    "per_file_df_ri",
    "search_df_candidates",
    "refresh_df",
    "fine_df_phase_drift",
    "bound_prepass_window",
]


#: Largest decimated-sample count the df pre-pass consumes
#: (:func:`bound_prepass_window` truncates to a power of two <= this);
#: ingest readers use it to read only the needed capture prefix.
PREPASS_MAX_SAMPLES = 1 << 21


def bound_prepass_window(
    x: np.ndarray, min_keep: int = 1 << 18, max_pow2: int = 21
) -> np.ndarray:
    """Cap the df pre-pass input at a power-of-two window.

    The C++ chain squaring-FFTs the WHOLE decimated file
    (``processing/CPP/main.cpp:363-450``); on TPU an arbitrary-length FFT
    whose odd factor is large lowers to a dense DFT matmul — a 60 s
    capture's 12M-point pre-pass tried to materialize an f32[93750,93750]
    (35 GB) on v5e.  Streams longer than ``min_keep`` decimated samples
    are truncated to the largest power of two <= min(len, 2**max_pow2):
    at 200 kS/s that is a >=1.3 s (<=10.5 s) window with <=0.8 Hz squaring
    bins — far below the estimator's +/-half-bin use downstream.
    Deliberate deviation, documented in PARITY.md.
    """
    n = x.shape[-1]
    if n <= min_keep:
        return x
    k = min(int(np.floor(np.log2(n))), max_pow2)
    return x[..., : 1 << k]


def window_mask(n: int, fs: float, lo_hz: float, hi_hz: float) -> np.ndarray:
    """Boolean mask over the *shifted* squaring spectrum selecting the
    2*df search window (the reference's ``k=find((freq<hi)&(freq>lo))``,
    ``godual_ranging.m:83-90``; note the window bounds are given on the
    2x-frequency axis, e.g. +/-20 kHz selects |df| < 10 kHz)."""
    freq = fftfreq_shifted(n, fs)
    return (freq > lo_hz) & (freq < hi_hz)


@partial(jax.jit, static_argnames=("mxu_fft",))
def squaring_spectrum(d: jax.Array, mxu_fft: bool = False) -> jax.Array:
    """``fftshift(abs(fft(d^2)))`` along the last axis."""
    return jnp.fft.fftshift(
        _squaring_spectrum_unshifted(d, mxu_fft=mxu_fft), axes=-1
    )


@partial(jax.jit, static_argnames=("mxu_fft",))
def _squaring_spectrum_unshifted(d: jax.Array, mxu_fft: bool = False):
    """``abs(fft(d^2))`` in natural bin order.

    The df estimators mask + argmax this in *unshifted* order and remap
    the index instead of fftshift-ing the data: on TPU the
    roll-into-masked-argmax fusion is pathological (measured 41.6 ms for
    the fused pair vs 5.6 ms unshifted at (50, 200000) — the shift and
    the argmax cost < 5 ms each in isolation).
    """
    if mxu_fft:
        from amaranth_twstft_tpu.ops.mxufft import fft_factored

        sq = fft_factored(d * d)
    else:
        sq = jnp.fft.fft(d * d, axis=-1)
    return jnp.abs(sq)


def _auto_mxu_fft(n: int) -> bool:
    """Route big FFTs to the staged matmul transform on accelerators.

    XLA's TPU FFT at large mixed-radix N materializes DFT-matrix blocks
    (observed: a f32[78125, 78125] = 24 GB allocation at N=1e7, the
    claudio 2-s block length) — the compile itself OOMs.  The factored
    transform runs the same length in bounded memory."""
    import jax as _j

    if _j.devices()[0].platform == "cpu":
        return False
    try:
        from amaranth_twstft_tpu.ops.mxufft import good_factors

        good_factors(n)
        return True
    except ValueError:
        return False


def _masked_argmax_shifted(sp_unshifted: jax.Array, mask_shifted) -> jax.Array:
    """argmax over the fftshift-ed spectrum, without shifting the data:
    roll the (tiny) mask the other way, then remap the winning index to
    the shifted axis.  Exactly ``_masked_argmax(fftshift(sp), mask)`` up
    to tie order."""
    n = sp_unshifted.shape[-1]
    half = n // 2
    mask_un = jnp.roll(jnp.asarray(mask_shifted), half)
    idx_un = _masked_argmax(sp_unshifted, mask_un)
    return jnp.mod(idx_un - half, n)


@jax.jit
def _masked_argmax(x: jax.Array, mask: jax.Array):
    # finite sentinel: +/-inf constants trigger a pathological (~200x
    # slower) compile path on the TPU backend; finfo.min is equivalent
    # for an argmax over magnitudes (all >= 0)
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    xm = jnp.where(mask, x, neg)
    return jnp.argmax(xm, axis=-1)


def squaring_df(d: jax.Array, fs: float, mask: np.ndarray,
                mxu_fft: bool = False):
    """Per-epoch df: argmax of the squaring spectrum inside ``mask``.

    Returns (df_hz, bin_index).  ``freq[argmax]/2`` with the reference's
    inclusive linspace axis (``godual_ranging.m:14-15,73``).
    """
    n = d.shape[-1]
    d2 = _squaring_spectrum_unshifted(d, mxu_fft=mxu_fft)
    idx = _masked_argmax_shifted(d2, mask)
    freq = jnp.asarray(fftfreq_shifted(n, fs), d2.dtype)
    return freq[idx] / 2.0, idx


def per_file_df(
    x: jax.Array,
    fs: float,
    decim: int,
    foffset_hz: float = 0.0,
    frange_hz: float = 8000.0,
    windowed: bool = True,
):
    """The C++ chain's fixed per-file df (``processing/CPP/main.cpp:363-450``).

    ``x`` is the decimated stream (every ``decim``-th complex sample).  The
    pre-pass mixes by ``exp(-2j*pi*foffset*t)`` to center the wanted signal,
    removes the mean, squares, FFTs, and takes the argmax within
    +/-2*frange on the decimated axis (``windowed=True``; the reference
    searches the *whole* spectrum for channel 2, ``main.cpp:442`` — pass
    ``windowed=False`` for that quirk).  Returns df in Hz.
    """
    m = x.shape[-1]
    t = jnp.arange(m, dtype=jnp.float64 if x.dtype == jnp.complex128 else jnp.float32)
    ang = -2.0 * jnp.pi * (foffset_hz * decim / fs) * t
    lo = jnp.cos(ang) + 1j * jnp.sin(ang)
    xm = x * lo.astype(x.dtype)
    xm = xm - jnp.mean(xm, axis=-1, keepdims=True)
    d2 = _squaring_spectrum_unshifted(xm)
    freq = fftfreq_shifted(m, fs / decim)
    if windowed:
        # C++ kmin/kmax: the last indices with freq <= -2*frange and
        # freq < 2*frange (``main.cpp:401-406``) — a half-open window.
        mask = (freq > -2.0 * frange_hz) & (freq < 2.0 * frange_hz)
    else:
        mask = np.ones(m, dtype=bool)
    idx = _masked_argmax_shifted(d2, mask)
    return jnp.asarray(freq, d2.dtype)[idx] / 2.0 + foffset_hz


@partial(
    jax.jit,
    static_argnames=("max_candidates", "notch_halfwidth", "mxu_fft"),
)
def _search_df_jit(
    d: jax.Array,
    dcode: jax.Array,
    fcode: jax.Array,
    mask: jax.Array,
    freq: jax.Array,
    fs: float,
    threshold: float,
    snr_threshold: float,
    max_candidates: int = 32,
    notch_halfwidth: int = 5,
    mxu_fft: bool = False,
):
    d2 = squaring_spectrum(d, mxu_fft=mxu_fft)
    masked = jnp.where(mask, d2, 0.0)
    med = jnp.nanmedian(jnp.where(mask, d2, jnp.nan))
    above = masked > med * threshold
    # densify: take the top-``max_candidates`` bins by magnitude among those
    # above threshold (the reference iterates all of them and keeps the
    # *last* passing candidate, ``claudio_...separate.m:33-44``; we keep the
    # highest-index passing candidate to match).
    score = jnp.where(above, d2, jnp.finfo(d2.dtype).min)
    cand_idx = jax.lax.top_k(score, max_candidates)[1]
    cand_valid = jnp.take(above, cand_idx)
    cand_df = jnp.take(freq, cand_idx) / 2.0
    snrs = quick_xcorr_snr(
        dcode[None, :], fcode, cand_df, fs, notch_halfwidth=notch_halfwidth
    )
    passing = cand_valid & (snrs > snr_threshold)
    # the reference keeps the last candidate in ascending-bin order
    best = jnp.max(jnp.where(passing, cand_idx, -1))
    return best, jnp.sum(above)


def search_df_candidates(
    d: jax.Array,
    dcode: jax.Array,
    fcode: jax.Array,
    fs: float,
    mask: np.ndarray,
    threshold: float = 20.0,
    snr_threshold: float = 100.0,
    max_candidates: int = 32,
) -> tuple[int, int]:
    """claudio ``search_df`` (``claudio_...separate.m:27-47``).

    ``d`` is a whole block (squaring FFT input), ``dcode`` its first code
    period (trial-correlation input).  Returns ``(kbon, n_above)``:
    ``kbon`` is the shifted-spectrum bin of the validated spectral line, or
    -1 if none validated (the reference's ``kbon=0`` sentinel).  The
    reference also rejects when more than 100 bins pass the threshold
    (``length(ktmp)<100``) — callers can use ``n_above`` for that gate.
    """
    n = d.shape[-1]
    freq = jnp.asarray(fftfreq_shifted(n, fs))
    best, n_above = _search_df_jit(
        d,
        dcode,
        fcode,
        jnp.asarray(mask),
        freq,
        fs,
        threshold,
        snr_threshold,
        max_candidates=max_candidates,
        mxu_fft=_auto_mxu_fft(n),
    )
    return int(best), int(n_above)


def refresh_df(d: jax.Array, fs: float, kbon: int, halfwidth: int = 3):
    """Per-block df refresh: argmax of the squaring spectrum within
    ``kbon +/- halfwidth`` (``claudio_...separate.m:168-169``)."""
    n = d.shape[-1]
    d2 = squaring_spectrum(d, mxu_fft=_auto_mxu_fft(n))
    # dynamic_slice clamps an out-of-range start silently; mirror the
    # clamp when rebuilding the absolute index or a kbon within
    # halfwidth of either spectrum edge reports a bin offset by the
    # clamped amount (silently detuning the block)
    start = jnp.clip(kbon - halfwidth, 0, n - (2 * halfwidth + 1))
    window = jax.lax.dynamic_slice_in_dim(d2, start, 2 * halfwidth + 1)
    idx = start + jnp.argmax(window)
    freq = jnp.asarray(fftfreq_shifted(n, fs), d2.dtype)
    return freq[idx] / 2.0, idx


@partial(jax.jit, static_argnames=("fs", "stride", "boxcar"))
def fine_df_phase_drift(
    y: jax.Array, fs: float, stride: int | None = None, boxcar: int | None = None
):
    """Fine frequency from the phase drift of the coarsely mixed signal.

    Behavioral model: the pyFFTW chain's refinement — fit a line to the
    smoothed phase of the coarse-mixed signal over (up to) the first fs/3
    samples; ``dfleftover = slope/2/pi``
    (``godual_ranging_fftw.py:35-39``; present in Octave only as commented
    code, ``godual_ranging.m:19-24``).  Batched over leading axes.

    Redesigned estimator (deliberate deviation, see PARITY.md): the
    reference boxcar-averages ``np.angle(y)`` of the *modulated* signal,
    which only converges when the residual keeps the total phase drift
    under ~1/4 cycle over the window — true for its 1 s epochs (squaring
    bin < 1 Hz) but not in general.  Here we instead

    1. square the signal (``y*y`` strips BPSK; the residual appears as a
       clean tone at ``2*df``, exactly the coarse estimator's trick),
    2. boxcar-average the *complex* squared signal via a cumulative sum
       ('valid' support only — no partial-sum edge ramps, which biased
       the fit at short epoch lengths),
    3. unwrap the phase increment-wise, ``dphi = angle(s[k+1]*conj(s[k]))``
       + cumsum — wrap-proof for any drift rate within pull-in,
    4. least-squares slope -> ``df = slope / (4*pi)`` (4, not 2: squaring
       doubled the frequency).

    Pull-in range (asserted by ``tests/test_doppler_fine.py``): the
    residual must satisfy ``|df| < fs / (4*stride)`` (per-step unwrap
    limit) and ``|df| < fs / (2*boxcar)`` (boxcar main-lobe limit).  With
    the auto-scaled defaults this is always at least +/- a few squaring
    bins, the regime the refinement is used in.
    """
    n = min(int(fs // 3), y.shape[-1])
    if boxcar is None:
        boxcar = max(2, min(100, n // 20))
    if stride is None:
        stride = max(1, n // 20000)
    s = y[..., :n]
    s = s * s
    # complex boxcar via cumsum: smoothed[i] = mean(s[i:i+boxcar])
    cs = jnp.cumsum(s, axis=-1)
    zero = jnp.zeros(s.shape[:-1] + (1,), s.dtype)
    cs = jnp.concatenate([zero, cs], axis=-1)
    sm = (cs[..., boxcar:] - cs[..., :-boxcar]) / boxcar
    sm = sm[..., ::stride]
    real_dtype = jnp.real(sm).dtype
    dphi = jnp.angle(sm[..., 1:] * jnp.conj(sm[..., :-1]))
    phi = jnp.cumsum(dphi, axis=-1)
    phi = jnp.concatenate([jnp.zeros_like(phi[..., :1]), phi], axis=-1)
    t = stride * jnp.arange(sm.shape[-1], dtype=real_dtype) / fs
    dt = t - jnp.mean(t)
    pm = jnp.mean(phi, axis=-1, keepdims=True)
    slope = jnp.sum(dt * (phi - pm), axis=-1) / jnp.sum(dt * dt)
    return slope / (4.0 * jnp.pi)


@partial(
    jax.jit,
    static_argnames=("fs", "decim", "foffset_hz", "frange_hz", "windowed"),
)
def per_file_df_ri(
    x_ri: jax.Array,
    fs: float,
    decim: int,
    foffset_hz: float = 0.0,
    frange_hz: float = 8000.0,
    windowed: bool = True,
) -> jax.Array:
    """Boundary-safe :func:`per_file_df`: float (..., 2) in, float out
    (one fused program — required on the axon TPU where complex arrays
    cannot cross the program boundary, and eager op-by-op execution
    would).  Accepts float16 input (the fast tunnel transfer format,
    see ``utils/io.read_sc16_epochs_ri``) and int8 without a scale —
    the squaring-spectrum argmax this computes is scale-invariant, so
    quantized units are as good as volts."""
    if x_ri.dtype in (jnp.float16, jnp.bfloat16, jnp.int8, jnp.int16):
        x_ri = x_ri.astype(jnp.float32)
    x = jax.lax.complex(x_ri[..., 0], x_ri[..., 1])
    return per_file_df(x, fs, decim, foffset_hz, frange_hz, windowed)


@partial(jax.jit, static_argnames=("fs", "halfwidth"))
def refresh_df_ri(x_ri: jax.Array, fs: float, kbon, halfwidth: int = 3):
    """Boundary-safe :func:`refresh_df` (float (..., 2) in, real out).

    Accepts int8/f16 transfer formats scale-free: the squaring-spectrum
    argmax this computes is scale-invariant."""
    if x_ri.dtype in (jnp.float16, jnp.bfloat16, jnp.int8, jnp.int16):
        x_ri = x_ri.astype(jnp.float32)
    d = jax.lax.complex(x_ri[..., 0], x_ri[..., 1])
    df, idx = refresh_df(d, fs, jnp.asarray(kbon, jnp.int32), halfwidth)
    return df, idx


@partial(
    jax.jit,
    static_argnames=("fs", "max_candidates", "notch_halfwidth"),
)
def search_df_candidates_ri(
    d_ri: jax.Array,
    dcode_ri: jax.Array,
    fcode_ri: jax.Array,
    fs: float,
    mask: jax.Array,
    threshold: float = 20.0,
    snr_threshold: float = 100.0,
    max_candidates: int = 32,
    notch_halfwidth: int = 5,
):
    """Boundary-safe :func:`search_df_candidates` (all-real I/O).

    ``d_ri`` may arrive int8/f16 (quantized transfer): the spectral-line
    threshold (x median) and the trial-correlation SNR are ratios, so a
    global scale factor — including one DIFFERENT from ``dcode_ri``'s —
    cancels."""
    if d_ri.dtype in (jnp.float16, jnp.bfloat16, jnp.int8, jnp.int16):
        d_ri = d_ri.astype(jnp.float32)
    d = jax.lax.complex(d_ri[..., 0], d_ri[..., 1])
    dcode = jax.lax.complex(dcode_ri[..., 0], dcode_ri[..., 1])
    fcode = jax.lax.complex(fcode_ri[..., 0], fcode_ri[..., 1])
    n = d.shape[-1]
    freq = jnp.asarray(fftfreq_shifted(n, fs), jnp.float32)
    return _search_df_jit(
        d, dcode, fcode, mask, freq, fs, threshold, snr_threshold,
        max_candidates=max_candidates, notch_halfwidth=notch_halfwidth,
        mxu_fft=_auto_mxu_fft(n),
    )
