"""Device-resident multi-channel DLL/PLL tracking — the 120-channel bank.

The reference receiver loops its (up to) 120 channels on the host, one
DGEMM + host epilogue per channel per second
(``experiments/231001_DLL_PLL/rxcomplex.cpp:36,466-799``).  Here ALL
channels run in ONE jitted program per second:

- per channel: carrier-phase-continuous downconversion, the lag-bank
  matmul ((codes, nobs) x (nobs, 2*nlag+1)), the HRC discriminator,
  median/IQR gating, the BPSK half-cycle unwrap (``lax.scan``) and both
  weighted linear fits all run on-device (``rxcomplex.cpp:592-744``);
- channels are processed by ``lax.map`` in vmapped groups, so peak
  memory stays at ``group`` channels' transients while the MXU sees
  batched matmuls;
- only (C,)-sized all-real fit results cross the program boundary; the
  host applies the tiny per-second state updates (fc += round(slope),
  pt re-pointing) in float64 — exactly the split the reference has
  between its BLAS call and its GSL epilogue, but one program for the
  whole bank instead of 120 dispatches.

Carrier-phase continuity across one second in float32 is achieved with
host-computed float64 phase tables: the per-sample LO phase
``frac(fc/fs * (pt + n))`` is decomposed as ``theta[code] + t1[block] +
t2[intra]`` (all < 1 cycle, exact modulo-1 split), so the device only
ever sums three small-magnitude f32 numbers — no O(fs) f64 anywhere.

The channel axis is the mesh axis: :func:`make_sharded_tracker_step`
lays the bank across devices with ``shard_map`` (SURVEY.md §2.6,
"channels x Doppler hypotheses sharded across chips").

Real-sample input (``rx.cpp``, the non-IQ variant): pass
``real_input=True`` — the downconversion then multiplies the real
stream by ``sqrt(2)*exp(-j2pi(fc t + phi))`` exactly as ``rx.cpp``'s
``downconv_trk`` (``rx.cpp:988-997``), and everything downstream is
unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.models.dllpll import (
    Channel,
    ChannelConfig,
    SecondReport,
    TrackState,
    _merge_param_row,
    _param_matches,
    _phase_unwrap_scan,
    _v2_to_dbm,
    build_channels_batch,
    dat_filename,
    log_line,
    parse_sdr_param,
)
from amaranth_twstft_tpu.ops.peaks import (
    hrc_correction,
    median_iqr_sigma,
    weighted_linear_fit,
)

__all__ = [
    "TrackerBank",
    "BankedReceiver",
    "MultiBankReceiver",
    "PendingSecond",
    "banked_track_step",
    "banked_acquire_step",
    "pack_int4_ri",
    "pack_int2_ri",
    "unpack_track_outputs",
    "make_sharded_tracker_step",
]

_SQRT2 = 1.4142135623730951  # rx.cpp's real->complex power compensation


def pack_int4_ri(bufs: np.ndarray) -> tuple[np.ndarray, float]:
    """Quantize (n_buf, S, 2) float I/Q to nibble-packed int4 -> one
    int8 byte per complex sample (I = low nibble, Q = high nibble).

    Quarter the f32 bytes, half the int8 bytes through the byte-rate-
    bound relay link.  Quantization noise is ``scale/sqrt(12)`` per
    component — at the tracker's -13 dB operating point that costs
    <0.2 dB of post-correlation SNR over a 40 ms code (the reference's
    own GNSS lineage runs 1-2 bit front ends; the RANGING chain keeps
    int8, whose 13 ps-class bias budget int4 would break — PARITY.md
    deviation 10)."""
    m = float(np.max(np.abs(bufs)))
    scale = (m / 7.0) if m > 0 else 1.0
    q = np.clip(np.round(bufs / scale), -8, 7).astype(np.int8)
    u = q.astype(np.uint8) & 0x0F
    return (u[..., 0] | (u[..., 1] << 4)).astype(np.int8), scale


def pack_int2_ri(bufs: np.ndarray) -> tuple[np.ndarray, float]:
    """Quantize (n_buf, S, 2) float I/Q to 2-bit sign/magnitude codes,
    four codes (= two complex samples) per uint8 byte.

    The classic GNSS front-end format: levels ``±1, ±3`` (in units of
    the threshold T ~ sigma), ~0.55 dB post-correlation SNR cost on a
    Gaussian-noise-dominated input — an EIGHTH of f16's bytes, for
    byte-rate-bound links where even int4 cannot keep 120 channels real
    time (<~12 MB/s).  Decode: :func:`_bufs_to_f32` (uint8 dtype is the
    int2 marker; int8 2-D is int4)."""
    sigma = float(np.std(bufs))
    t = sigma if sigma > 0 else 1.0
    sign = (bufs > 0).astype(np.uint8)
    mag = (np.abs(bufs) > t).astype(np.uint8)
    code = (sign << 1) | mag  # (n_buf, S, 2) in 0..3
    n_buf, S, _ = code.shape
    if S % 2:
        code = np.concatenate(
            [code, np.zeros((n_buf, 1, 2), np.uint8)], axis=1
        )
    c = code.reshape(n_buf, -1, 2, 2)  # (n_buf, S2, sample, comp)
    byte = (c[:, :, 0, 0] | (c[:, :, 0, 1] << 2)
            | (c[:, :, 1, 0] << 4) | (c[:, :, 1, 1] << 6))
    return byte.astype(np.uint8), t


def _bufs_to_f32(iq_ri, scale):
    """Device-side decode of any transfer format to (n_buf, S, 2) f32:
    2-bit-packed uint8 (:func:`pack_int2_ri`), nibble-packed int4
    (ndim==2 int8), int8 + scale, f16/bf16, or f32."""
    if iq_ri.dtype == jnp.uint8 and iq_ri.ndim == 2:
        if scale is None:
            raise ValueError("int2-packed iq_ri requires the threshold "
                             "scale")
        b = iq_ri

        def lvl(c):
            # code = sign<<1 | mag -> value (2*sign-1) * (1 + 2*mag)
            c = c.astype(jnp.int8)
            return ((2 * (c >> 1) - 1) * (1 + 2 * (c & 1))).astype(
                jnp.float32
            )

        fields = jnp.stack(
            [lvl(b & 3), lvl((b >> 2) & 3), lvl((b >> 4) & 3),
             lvl((b >> 6) & 3)],
            axis=-1,
        )  # (n_buf, S2, [I0, Q0, I1, Q1])
        iq = fields.reshape(b.shape[0], -1, 2)  # (n_buf, 2*S2, 2)
        return iq * scale.astype(jnp.float32)
    if iq_ri.dtype == jnp.int8 and iq_ri.ndim == 2:
        if scale is None:
            raise ValueError("int4-packed iq_ri requires the dequant scale")
        lo = jnp.right_shift(jnp.left_shift(iq_ri, 4), 4)  # I, sign-extended
        hi = jnp.right_shift(iq_ri, 4)  # Q (arithmetic shift)
        iq = jnp.stack([lo, hi], axis=-1).astype(jnp.float32)
        return iq * scale.astype(jnp.float32)
    if iq_ri.dtype == jnp.int8:
        if scale is None:
            raise ValueError(
                "int8 iq_ri requires the per-second dequantization "
                "scale (q = round(x/scale))"
            )
        return iq_ri.astype(jnp.float32) * scale.astype(jnp.float32)
    if iq_ri.dtype in (jnp.float16, jnp.bfloat16):
        return iq_ri.astype(jnp.float32)
    return iq_ri


def _block_split(nobs: int) -> tuple[int, int]:
    """(nblk, B) with nblk*B == nobs and B the divisor just >= sqrt(nobs)
    — the intra-code split of the LO phase tables."""
    d = int(np.sqrt(nobs))
    while d >= 1:
        if nobs % d == 0:
            return d, nobs // d
        d -= 1
    return 1, nobs


# ----------------------------------------------------------------------
# The per-second tracking program
# ----------------------------------------------------------------------
def _track_one(
    iq_ri,
    wav_ext,
    psbb,
    phys,
    pt,
    theta,
    t1,
    t2,
    last_phi,
    *,
    ncodes: int,
    nobs: int,
    nlag: int,
    bps: int,
    fs: float,
    real_input: bool,
):
    """One channel's second of tracking (device side of ``_track``)."""
    nblk, B = t1.shape[-1], t2.shape[-1]
    nlags = 2 * nlag + 1
    f32 = jnp.float32

    seg = jax.lax.dynamic_slice(
        iq_ri,
        (phys.astype(jnp.int32), pt.astype(jnp.int32), jnp.int32(0)),
        (1, ncodes * nobs, 2),
    )[0]
    sr = seg[:, 0].reshape(ncodes, nblk, B)
    si = seg[:, 1].reshape(ncodes, nblk, B)
    ang = (2.0 * np.pi) * (
        theta[:, None, None] + t1[None, :, None] + t2[None, None, :]
    )
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    if real_input:
        # rx.cpp downconv_trk: sqrt(2) * smp * exp(-j 2pi (ff n + phi))
        obs_re = (_SQRT2 * sr * c).reshape(ncodes, nobs)
        obs_im = (-_SQRT2 * sr * s).reshape(ncodes, nobs)
    else:
        obs_re = (sr * c + si * s).reshape(ncodes, nobs)
        obs_im = (si * c - sr * s).reshape(ncodes, nobs)

    # lag bank: 2*nlag+1 circularly shifted replicas, materialized
    # transiently from the circular extension (rxcomplex.cpp:430,605)
    starts = 2 * nlag - jnp.arange(nlags)
    W = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(wav_ext, (s0,), (nobs,))
    )(starts)  # (nlags, nobs); W[l] == roll(wav, l - nlag)
    # precision="highest": the HRC discriminator reads sub-sample code
    # phase off ratios of these correlation sums; TPU's default 1-pass
    # bf16 f32-dot would round each product to ~8 mantissa bits
    re = jnp.einsum("pn,ln->pl", obs_re, W, preferred_element_type=f32,
                    precision="highest")
    im = jnp.einsum("pn,ln->pl", obs_im, W, preferred_element_type=f32,
                    precision="highest")
    power = (0.5 * 4.0 / nobs**2) * (re * re + im * im)

    pk_idx = jnp.argmax(power, axis=-1).astype(jnp.int32)
    pkp = jnp.take_along_axis(power, pk_idx[:, None], -1)[:, 0]
    interior = (pk_idx >= 2) & (pk_idx < nlags - 2)
    # peak-quality gate (see dllpll._track: the reference's power gate is
    # commented out; without one a pure-noise second keeps "lock")
    floor = jnp.median(power, axis=-1)
    quality = pkp > 10.0 * jnp.maximum(floor, 1e-30)
    w = (interior & quality).astype(f32)

    hrc = hrc_correction(power, pk_idx)
    # code phase RELATIVE to pt, in ns: |values| <= (nlag+1)*1e9/fs, so
    # f32 keeps sub-ps resolution; the host adds pt*1e9/fs in f64
    gd_rel = (pk_idx.astype(f32) - nlag + hrc) * f32(1e9 / fs)
    ps = pkp / jnp.maximum(psbb, 1e-30)
    re_pk = jnp.take_along_axis(re, pk_idx[:, None], -1)[:, 0]
    im_pk = jnp.take_along_axis(im, pk_idx[:, None], -1)[:, 0]
    # residual carrier phase in cycles (the negated lag-bank convention,
    # see dllpll._track / ADVICE r1 note)
    res_phi = jnp.arctan2(im_pk, re_pk) / f32(2.0 * np.pi)

    med, sigma = median_iqr_sigma(gd_rel, w)
    ok = jnp.abs(gd_rel - med) < jnp.maximum(3.0 * sigma, 1e-6)
    w = w * ok
    cnt = jnp.sum(w).astype(jnp.int32)
    locked = 2 * cnt > bps

    res_phi_u = _phase_unwrap_scan(res_phi, w, last_phi.astype(res_phi.dtype))
    has_valid = jnp.any(w > 0)
    idx_last = (ncodes - 1) - jnp.argmax((w > 0)[::-1])
    last_phi_new = jnp.where(has_valid, res_phi_u[idx_last], last_phi)

    duration = nobs / fs
    p_ax = jnp.arange(ncodes, dtype=f32)
    tt_phi = p_ax * f32(duration) + pt.astype(f32) / f32(fs)
    c0p, c1p, _ = weighted_linear_fit(tt_phi, res_phi_u, w)
    tt_gd = p_ax * f32(duration)
    c0g, c1g, chi2 = weighted_linear_fit(tt_gd, gd_rel, w)
    pk_mean = jnp.sum(ps * w) / jnp.maximum(cnt.astype(f32), 1.0)

    # ONE packed row per channel: every d2h fetch through the relay
    # pays a fixed latency, so the nine per-channel results ship as a
    # single (9,) f32 vector (cnt/locked ride as exact small floats)
    return jnp.stack(
        [
            c0p,
            c1p,
            c0g,
            c1g,
            chi2,
            cnt.astype(f32),
            pk_mean,
            last_phi_new.astype(f32),
            locked.astype(f32),
        ]
    )


@partial(
    jax.jit,
    static_argnames=("ncodes", "nobs", "nlag", "bps", "fs", "real_input", "group"),
)
def banked_track_step(
    iq_ri,
    wav_ext,
    psbb,
    phys,
    pt,
    theta,
    t1,
    t2,
    last_phi,
    scale=None,
    *,
    ncodes: int,
    nobs: int,
    nlag: int,
    bps: int,
    fs: float,
    real_input: bool = False,
    group: int = 4,
):
    """All channels' tracking second in one program.

    ``iq_ri``: (n_buffers, S, 2) float sample buffers (raw physical
    channels + optional SIC-cleaned rows); per-channel arrays are stacked
    on axis 0 (C channels).  ``iq_ri`` may arrive as float16 (sc16
    samples ship half-precision through the relay tunnel — ~4x the f32
    byte rate, -66 dB quantization; see ``utils/io.read_sc16_epochs_ri``),
    as int8 + ``scale``, or as nibble-packed int4 ((n_buffers, S) int8,
    see :func:`pack_int4_ri`) and is decoded to f32 here, on device.
    Returns ONE packed (C, 9) float32 array — rows ``(c0p, c1p, c0g_rel,
    c1g, chi2, cnt, pk_mean, last_phi, locked)`` — so the host pays a
    single d2h fetch per second (decode with
    :func:`unpack_track_outputs`).
    """
    iq_ri = _bufs_to_f32(iq_ri, scale)
    fn = partial(
        _track_one,
        iq_ri,
        ncodes=ncodes,
        nobs=nobs,
        nlag=nlag,
        bps=bps,
        fs=fs,
        real_input=real_input,
    )
    return jax.lax.map(
        lambda xs: fn(*xs),
        (wav_ext, psbb, phys, pt, theta, t1, t2, last_phi),
        batch_size=group,
    )


def unpack_track_outputs(packed: np.ndarray) -> tuple:
    """(C, 9) packed rows -> the nine (C,) host arrays
    ``(c0p, c1p, c0g_rel, c1g, chi2, cnt, pk_mean, last_phi, locked)``
    with integer/bool columns restored."""
    a = np.asarray(packed)
    cols = [a[:, i] for i in range(9)]
    cols[5] = cols[5].astype(np.int32)
    cols[8] = cols[8] > 0.5
    return tuple(cols)


def make_sharded_tracker_step(
    mesh,
    *,
    ncodes: int,
    nobs: int,
    nlag: int,
    bps: int,
    fs: float,
    real_input: bool = False,
    group: int = 4,
    axis: str | None = None,
):
    """Channel-sharded :func:`banked_track_step` over a device mesh.

    Sample buffers are replicated (every device needs the whole second);
    the per-channel state arrays and outputs are laid out on ``axis``.
    C must be a multiple of the axis size (pad with dummy channels).
    The returned step takes an optional trailing ``scale`` (replicated
    scalar) for the int8/int4 transfer formats.
    """
    from jax.sharding import PartitionSpec as P

    if axis is None:
        axis = mesh.axis_names[-1]

    def local(iq_ri, wav_ext, psbb, phys, pt, theta, t1, t2, last_phi,
              scale):
        return banked_track_step(
            iq_ri, wav_ext, psbb, phys, pt, theta, t1, t2, last_phi,
            scale,
            ncodes=ncodes, nobs=nobs, nlag=nlag, bps=bps, fs=fs,
            real_input=real_input, group=group,
        )

    inner = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 8 + (P(),),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def step(iq_ri, wav_ext, psbb, phys, pt, theta, t1, t2, last_phi,
             scale=jnp.float32(1.0)):
        return inner(iq_ri, wav_ext, psbb, phys, pt, theta, t1, t2,
                     last_phi, scale)

    return step


# ----------------------------------------------------------------------
# The batched acquisition program
# ----------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "nobs", "nsec", "fs", "win", "chunk", "real_input",
    ),
)
def banked_acquire_step(
    iq_ri,
    fcode_ri,
    buf_idx,
    shifts,
    hyp_ok,
    start,
    scale=None,
    *,
    nobs: int,
    nsec: int,
    fs: float,
    win: int = 401,
    chunk: int = 4,
    real_input: bool = False,
):
    """Dense CAF acquisition for a batch of channels in one program.

    - one code epoch per channel (at the TRACED ``start`` sample — a
      different probe epoch per attempt costs no recompile) is
      searched over the SHARED integer-bin Doppler grid ``shifts``; each
      channel's admissible hypotheses are selected by ``hyp_ok`` (C, H)
      — the union-grid equivalent of the per-channel hierarchical scan
      (``rxcomplex.cpp:522-586``),
    - Doppler refine: the 2-point sinc interpolator across hypotheses,
    - trial-correlation SNR (claudio's detection statistic) per channel,
    - fine frequency: ONE squaring FFT per sample buffer over the whole
      second, then a ``win``-bin windowed argmax + parabola around each
      channel's doubled CAF frequency — sub-Hz pull-in like the
      reference's halving-to-<1-Hz loop (``rxcomplex.cpp:560-568``).

    Returns (df_hz, pt_idx, snr, pk_power), all (C,) and real.
    """
    from amaranth_twstft_tpu.ops.correlator import quick_xcorr_snr

    f32 = jnp.float32
    iq_ri = _bufs_to_f32(iq_ri, scale)
    C = fcode_ri.shape[0]
    fcode = jax.lax.complex(fcode_ri[..., 0], fcode_ri[..., 1])

    # -- per-channel epoch at the traced start (slice BEFORE the row
    # gather so the gather moves (C, nobs, 2), not (C, S, 2)) -----------
    segs = jax.lax.dynamic_slice_in_dim(
        iq_ri, start.astype(jnp.int32), nobs, axis=1
    )[buf_idx]  # (C, nobs, 2)
    if real_input:
        d = jax.lax.complex(_SQRT2 * segs[..., 0], jnp.zeros_like(segs[..., 0]))
    else:
        d = jax.lax.complex(segs[..., 0], segs[..., 1])
    d = d - jnp.mean(d, axis=-1, keepdims=True)
    D = jnp.fft.fft(d, axis=-1)

    # -- dense CAF over the shared grid, chunked ------------------------
    H = shifts.shape[0]
    pad = (-H) % chunk
    shifts_p = jnp.concatenate([shifts, jnp.zeros((pad,), shifts.dtype)])

    def one_chunk(sh):
        def one(s0):
            corr = jnp.fft.ifft(jnp.roll(D, -s0, axis=-1) * fcode, axis=-1)
            p = jnp.abs(corr) ** 2
            return jnp.max(p, axis=-1), jnp.argmax(p, axis=-1).astype(jnp.int32)

        return jax.vmap(one)(sh)

    pks, idxs = jax.lax.map(one_chunk, shifts_p.reshape(-1, chunk))
    power = pks.reshape(-1, C)[:H].T  # (C, H)
    index = idxs.reshape(-1, C)[:H].T

    neg = jnp.asarray(jnp.finfo(power.dtype).min, power.dtype)
    powm = jnp.where(hyp_ok, power, neg)
    h_best = jnp.argmax(powm, axis=-1)
    pk = jnp.take_along_axis(power, h_best[:, None], -1)[:, 0]
    pt_idx = jnp.take_along_axis(index, h_best[:, None], -1)[:, 0]
    bin_hz = fs / nobs
    f_best = jnp.take(shifts, h_best).astype(f32) * f32(bin_hz)
    # sinc 2-point Doppler refine (see ops/caf.caf_search)
    hm1 = jnp.clip(h_best - 1, 0, H - 1)
    hp1 = jnp.clip(h_best + 1, 0, H - 1)
    am1 = jnp.sqrt(jnp.take_along_axis(power, hm1[:, None], -1)[:, 0])
    ap1 = jnp.sqrt(jnp.take_along_axis(power, hp1[:, None], -1)[:, 0])
    step_bins = (shifts[1] - shifts[0]) if H > 1 else jnp.int32(1)
    den = ap1 + am1
    safe = jnp.where(den == 0, 1.0, den)
    delta = jnp.where(den == 0, 0.0, (ap1 - am1) / safe)
    interior = (h_best > 0) & (h_best < H - 1)
    df_caf = f_best + jnp.where(
        interior, delta * step_bins.astype(f32) * f32(bin_hz), 0.0
    )

    # -- trial-correlation SNR gate (claudio_...separate.m:33-44) --------
    snr = quick_xcorr_snr(d, jnp.conj(fcode), df_caf, fs)

    # -- fine df: squaring FFT per buffer, windowed per channel ----------
    if real_input:
        x = iq_ri[:, :nsec, 0].astype(f32) * f32(_SQRT2)
        x2c = jax.lax.complex(x * x, jnp.zeros_like(x))
    else:
        xc = jax.lax.complex(iq_ri[:, :nsec, 0], iq_ri[:, :nsec, 1])
        xc = xc - jnp.mean(xc, axis=-1, keepdims=True)
        x2c = xc * xc
    spec2 = jnp.abs(jnp.fft.fft(x2c, axis=-1))  # (n_buf, nsec)
    spec2 = jnp.concatenate([spec2, spec2[:, :win]], axis=-1)
    bin2 = fs / nsec
    center = jnp.round(2.0 * df_caf / f32(bin2)).astype(jnp.int32)
    startw = jnp.mod(center - win // 2, nsec)

    def fine_one(buf, s0):
        w_ = jax.lax.dynamic_slice(spec2[buf], (s0,), (win,))
        k = jnp.argmax(w_)
        km1 = jnp.clip(k - 1, 0, win - 1)
        kp1 = jnp.clip(k + 1, 0, win - 1)
        am = w_[km1]
        a0 = w_[k]
        ap = w_[kp1]
        den2 = am + ap - 2.0 * a0
        sd = jnp.where(den2 == 0, 1.0, den2)
        corr = jnp.where(den2 == 0, 0.0, (am - ap) / sd / 2.0)
        pos = s0.astype(f32) + k.astype(f32) + corr
        pos = jnp.mod(pos, nsec)
        signed = jnp.where(pos > nsec / 2, pos - nsec, pos)
        return signed * f32(bin2) / 2.0

    df_fine = jax.vmap(fine_one)(buf_idx, startw)
    return df_fine, pt_idx, snr, pk


# ----------------------------------------------------------------------
# Host orchestration
# ----------------------------------------------------------------------
@dataclass
class TrackerBank:
    """Stacked replica arrays + geometry for a homogeneous channel group."""

    channels: list[Channel]
    fs: float
    nobs: int
    bps: int
    nlag: int
    nblk: int
    B: int
    wav_ext: np.ndarray  # (C, nobs + 2*nlag) f32
    psbb: np.ndarray  # (C,) f32
    fcode_ri: np.ndarray  # (C, nobs, 2) f32, conjugated replica spectra

    @property
    def ncodes(self) -> int:
        return self.bps - 1

    @property
    def n_channels(self) -> int:
        return len(self.channels)


def build_bank(channels: list[Channel], fs: float) -> TrackerBank:
    geoms = {(c.nobs, c.cfg.codes_per_second, c.cfg.nlag) for c in channels}
    if len(geoms) != 1:
        raise ValueError(
            f"banked tracking needs homogeneous channel geometry, got {geoms}"
        )
    nobs, bps, nlag = next(iter(geoms))
    nblk, B = _block_split(nobs)
    # wav_ext[m] = wav[(m - nlag) % nobs]; the slice starting at
    # (2*nlag - l) is then wav[(n + nlag - l) % nobs] = roll(wav, l - nlag)
    # — the same lag bank as Receiver._lag_matrix
    wav_ext = np.stack(
        [
            np.concatenate([c.wav[-nlag:], c.wav, c.wav[:nlag]])
            for c in channels
        ]
    ).astype(np.float32)
    psbb = np.array([c.psbb for c in channels], dtype=np.float32)
    fcode_ri = np.stack(
        [
            np.stack([c.fcode.real, c.fcode.imag], axis=-1).astype(np.float32)
            for c in channels
        ]
    )
    return TrackerBank(
        channels=channels,
        fs=fs,
        nobs=nobs,
        bps=bps,
        nlag=nlag,
        nblk=nblk,
        B=B,
        wav_ext=wav_ext,
        psbb=psbb,
        fcode_ri=fcode_ri,
    )


def phase_tables(
    bank: TrackerBank, pt: np.ndarray, fc: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side float64 LO phase bookkeeping -> three f32 tables.

    ``frac(fc/fs * (pt + p*nobs + b*B + u))`` == ``theta[c,p] + t1[c,b] +
    t2[c,u]`` (mod 1) — each term carries the f64-exact fractional part,
    so the device-side sum is accurate to ~2e-7 cycles regardless of how
    many carrier cycles elapse in the second (the f32 answer to
    ``downconv_trk``'s running double phase, ``rxcomplex.cpp:592-600``).
    """
    r = np.asarray(fc, np.float64) / bank.fs
    pt = np.asarray(pt, np.float64)
    p = np.arange(bank.ncodes, dtype=np.float64)
    theta = np.mod((pt[:, None] + p[None, :] * bank.nobs) * r[:, None], 1.0)
    t1 = np.mod(r[:, None] * (bank.B * np.arange(bank.nblk))[None, :], 1.0)
    t2 = np.mod(r[:, None] * np.arange(bank.B)[None, :], 1.0)
    return (
        theta.astype(np.float32),
        t1.astype(np.float32),
        t2.astype(np.float32),
    )


@dataclass
class PendingSecond:
    """One second of samples, packed for transfer and (possibly already)
    in flight to the device — ``jax.device_put`` returns before the
    bytes land, so a prefetched second's upload overlaps the previous
    second's compute (the double-buffering the reference gets for free
    from its synchronous disk read being ~100x faster than its compute,
    ``rxcomplex.cpp:469-479``)."""

    dev: object  # device array in the transfer format
    scale: object | None  # device scalar for int8/int4, else None
    px_rows: np.ndarray  # (n_buf,) noise power, computed PRE-quantization
    have: np.ndarray  # (C,) which channels have samples this second


class BankedReceiver:
    """Multi-channel receiver with device-batched tracking + acquisition.

    Drop-in for :class:`amaranth_twstft_tpu.models.dllpll.Receiver` on
    homogeneous channel geometry; one jitted program per second for the
    whole bank.  ``mesh`` lays the channel axis across devices
    (:func:`make_sharded_tracker_step`); ``real_input=True`` is the
    ``rx.cpp`` real-sample mode; ``out_dir`` writes the reference's
    per-channel ``.dat`` rows and ``rxcomplex.log``.

    ``transfer`` picks the H2D sample format: ``"auto"`` (f16 when the
    samples fit its range, else f32), ``"f16"``, ``"f32"``, ``"int8"``
    (half of f16's bytes), ``"int4"`` (nibble-packed, quarter —
    <0.2 dB post-correlation SNR cost at tracking's operating point,
    see :func:`pack_int4_ri`) or ``"int2"`` (sign/magnitude GNSS
    format, an eighth — ~0.55 dB, for links below ~12 MB/s where int4
    cannot keep the bank real time, see :func:`pack_int2_ri`).  For real-time tracking over a
    byte-rate-bound link, drive seconds through :meth:`run_stream`,
    which double-buffers the upload (VERDICT r04 item 1).
    """

    def __init__(
        self,
        channels: list[ChannelConfig],
        fs: float = 5e6,
        *,
        group: int = 4,
        mesh=None,
        real_input: bool = False,
        out_dir: str | None = None,
        acq_chunk: int = 4,
        transfer: str = "auto",
    ):
        self.fs = fs
        self.real_input = real_input
        self.group = group
        self.mesh = mesh
        self.out_dir = out_dir
        self.acq_chunk = acq_chunk
        if transfer not in ("auto", "f16", "f32", "int8", "int4", "int2"):
            raise ValueError(f"unknown transfer format {transfer!r}")
        self.transfer = transfer
        self.log: list[str] = []
        self._acq_attempt = 0  # probe-epoch diversity counter
        self._init_bank(build_channels_batch(channels, fs))

    # -- setup ----------------------------------------------------------
    def _init_bank(self, built: list[Channel]) -> None:
        self.bank = build_bank(built, self.fs)
        self.channels = built
        self.states = [TrackState(fc=c.cfg.fc_init_hz) for c in built]
        self._phys_names = sorted({c.cfg.physical for c in built})
        self._sic_any = any(c.cfg.is_sic for c in built)
        n_phys = len(self._phys_names)
        # buffer row per channel: raw phys, or the SIC-cleaned row
        self._buf_idx = np.array(
            [
                self._phys_names.index(c.cfg.physical)
                + (n_phys if c.cfg.is_sic else 0)
                for c in built
            ],
            dtype=np.int32,
        )
        # device-resident constants: wav_ext is ~96 MB at production
        # geometry - re-shipping it every second would consume the whole
        # per-second budget at tunnel link rates (uploaded lazily on
        # first use so CPU-only construction stays cheap)
        self._dev_const: dict | None = None
        self._step = None
        if self.mesh is not None:
            b = self.bank
            self._step = make_sharded_tracker_step(
                self.mesh,
                ncodes=b.ncodes,
                nobs=b.nobs,
                nlag=b.nlag,
                bps=b.bps,
                fs=self.fs,
                real_input=self.real_input,
                group=self.group,
            )

    def reload_params(self, text: str) -> list[int]:
        """``sdr.param`` hot-reload (``rxcomplex.cpp:257-285``): unchanged
        rows keep their tracking state, changed rows re-acquire."""
        known = {c.cfg.prn_id: c.cfg for c in self.channels}
        new_cfgs = parse_sdr_param(text)
        changed: list[int] = []
        plan: list[Channel | int] = []  # kept Channel | index into builds
        states: list[TrackState] = []
        to_build: list[ChannelConfig] = []
        for i, cfg in enumerate(new_cfgs):
            if i < len(self.channels) and _param_matches(
                self.channels[i].cfg, cfg
            ):
                plan.append(self.channels[i])
                states.append(self.states[i])
            else:
                base = known.get(
                    cfg.prn_id, self.channels[0].cfg if self.channels else None
                )
                if base is not None:
                    cfg = _merge_param_row(base, cfg)
                plan.append(len(to_build))
                to_build.append(cfg)
                states.append(TrackState(fc=cfg.fc_init_hz))
                changed.append(i)
        # only the CHANGED rows are rebuilt, in one batched pass
        new_built = (
            build_channels_batch(to_build, self.fs) if to_build else []
        )
        built = [new_built[p] if isinstance(p, int) else p for p in plan]
        changed.extend(range(len(new_cfgs), len(self.channels)))
        old_states = states
        self._init_bank(built)
        self.states = old_states
        return changed

    # -- per-second orchestration ----------------------------------------
    def _pack_second(self, iq_by_phys: dict[str, np.ndarray]):
        """Host half of a second: fill the (2*n_phys, S, 2) buffer (raw
        rows + SIC-cleaned rows), measure the noise power at full
        precision, and quantize/cast to the transfer format."""
        b = self.bank
        n_phys = len(self._phys_names)
        S = int(self.fs) + b.nobs

        # second-start snapshot: SIC reconstruction must use THIS second's
        # alignment (the reference's pt_prev, rxcomplex.cpp:513)
        snapshot = [(s.pt, s.fc, s.df) for s in self.states]

        bufs = np.zeros((2 * n_phys, S, 2), dtype=np.float32)
        raw = {}
        for k, name in enumerate(self._phys_names):
            smp = iq_by_phys.get(name)
            if smp is None:
                continue
            m = min(len(smp), S)
            raw[name] = smp
            if self.real_input:
                bufs[k, :m, 0] = np.real(smp[:m])
            else:
                bufs[k, :m, 0] = np.real(smp[:m])
                bufs[k, :m, 1] = np.imag(smp[:m])
            bufs[n_phys + k] = bufs[k]
        if self._sic_any:
            for k, name in enumerate(self._phys_names):
                if name in raw:
                    cleaned = self._mai_free(name, raw[name], snapshot)
                    m = min(len(cleaned), S)
                    bufs[n_phys + k, :m, 0] = np.real(cleaned[:m])
                    if not self.real_input:
                        bufs[n_phys + k, :m, 1] = np.imag(cleaned[:m])

        # noise floor per buffer row (rxcomplex px) at FULL precision,
        # before any transfer quantization touches the samples (rx.cpp
        # keeps px as the plain mean square of the raw samples — no
        # sqrt(2) compensation — so real mode matches it)
        nsec = int(self.fs)
        px_rows = np.mean(
            bufs[:, :nsec, 0] ** 2 + bufs[:, :nsec, 1] ** 2, axis=1
        )

        peak = float(np.max(np.abs(bufs)))
        scale = None
        t = self.transfer
        if t == "int4":
            packed, s = pack_int4_ri(bufs)
            scale = np.float32(s)
        elif t == "int8":
            s = peak / 127.0 if peak > 0 else 1.0
            packed = np.clip(np.round(bufs / s), -127, 127).astype(np.int8)
            scale = np.float32(s)
        elif t == "f16" or (t == "auto" and peak < 6.0e4):
            # f16 fits any int16-derived capture; overflow would poison
            # the FFTs with inf, hence the range check in auto mode
            packed = bufs.astype(np.float16)
        else:
            packed = bufs

        have = np.array(
            [self._phys_names[i % n_phys] in raw for i in self._buf_idx]
        )
        return packed, scale, px_rows, have

    def upload_second(self, iq_by_phys: dict[str, np.ndarray]) -> PendingSecond:
        """Pack a second and START its H2D upload (``jax.device_put`` is
        asynchronous); pass the handle to :meth:`process_second` later.
        Uploading second k+1 before fetching second k's results is the
        double-buffering that keeps the bank real-time on a link whose
        transfer time rivals the compute time (:meth:`run_stream`)."""
        packed, scale, px_rows, have = self._pack_second(iq_by_phys)
        dev = jax.device_put(packed)
        sdev = None if scale is None else jnp.asarray(scale)
        return PendingSecond(dev=dev, scale=sdev, px_rows=px_rows, have=have)

    def process_second(
        self,
        iq_by_phys: dict[str, np.ndarray] | None = None,
        *,
        pending: PendingSecond | None = None,
    ):
        """One second for every channel; same contract as
        ``Receiver.process_second`` (arrays of >= fs samples per physical
        channel; real arrays in ``real_input`` mode).  Alternatively pass
        ``pending`` from :meth:`upload_second` to reuse an already-
        uploaded buffer."""
        if pending is None:
            pending = self.upload_second(iq_by_phys)
        C = self.bank.n_channels
        have = pending.have
        cold = [
            i
            for i in range(C)
            if have[i] and not self.states[i].is_trk
        ]
        acquired = self._acquire_batch(pending, cold) if cold else set()

        warm = [
            i
            for i in range(C)
            if have[i] and self.states[i].is_trk and i not in acquired
        ]
        reports: list[SecondReport | None] = [None] * C
        if warm:
            self._track_all(pending, warm, reports)
        return reports

    def run_stream(self, seconds, *, prefetch: bool = True):
        """Drive the receiver over an iterable of per-second sample
        dicts, double-buffering the H2D path: second k+1 is packed and
        its upload STARTED while second k's device program runs, so wall
        time per second approaches max(transfer, compute) instead of
        their sum (VERDICT r04 item 1; the real-time bar is
        ``rxcomplex.cpp:36`` — 120 channels, 1 s of samples per s).

        Yields each second's reports list.  SIC configurations disable
        the prefetch: the cleaned rows must be rebuilt from the replica
        state of the second BEFORE them, which is only final after the
        previous second completes."""
        it = iter(seconds)
        if self._sic_any or not prefetch:
            for sec in it:
                yield self.process_second(sec)
            return
        try:
            cur = self.upload_second(next(it))
        except StopIteration:
            return
        for nxt_raw in it:
            nxt = self.upload_second(nxt_raw)  # overlaps cur's compute
            yield self.process_second(pending=cur)
            cur = nxt
        yield self.process_second(pending=cur)

    # -- SIC (host; see dllpll.Receiver._mai_free) -----------------------
    def _mai_free(self, phys: str, smp: np.ndarray, snapshot) -> np.ndarray:
        out = np.asarray(smp, dtype=np.complex128).copy()
        n = np.arange(len(smp), dtype=np.float64)
        for k, ch in enumerate(self.channels):
            st = self.states[k]
            if (
                ch.cfg.physical != phys
                or ch.cfg.is_sic
                or not st.is_trk
                or st.is_first
            ):
                continue
            pt_k, fc_k, df_k = snapshot[k]
            code = ch.wav.astype(np.float64)[
                (np.arange(len(smp)) - pt_k) % ch.nobs
            ]
            f = (fc_k + df_k) / self.fs
            rep = code * np.exp(2j * np.pi * np.mod(f * n, 1.0))
            nblk = len(smp) // ch.nobs
            if nblk == 0:
                continue
            m = nblk * ch.nobs
            rb = rep[:m].reshape(nblk, ch.nobs)
            sb = out[:m].reshape(nblk, ch.nobs)
            denom = np.sum(np.abs(rb) ** 2, axis=1)
            a = np.sum(np.conj(rb) * sb, axis=1) / np.maximum(denom, 1e-30)
            out[:m] -= (a[:, None] * rb).ravel()
            if m < len(smp):
                out[m:] -= a[-1] * rep[m:]
        return out

    # -- acquisition ------------------------------------------------------
    def _acquire_batch(
        self, pending: PendingSecond, cold: list[int]
    ) -> set[int]:
        b = self.bank
        bin_hz = self.fs / b.nobs
        # shared integer-bin hypothesis grid: union of cold ranges at the
        # finest requested step
        los, his = [], []
        for i in cold:
            cfg = self.channels[i].cfg
            los.append(cfg.fc_init_hz - cfg.acq_range_hz)
            his.append(cfg.fc_init_hz + cfg.acq_range_hz)
        # ONE-BIN hypothesis spacing regardless of the requested fstep:
        # the coherent integration is one code (T = nobs/fs), whose
        # ambiguity main lobe is +/- one bin — a coarser grid can land on
        # a sinc null and miss the signal outright.  The reference's
        # fstep is only the STARTING step of its halving loop
        # (rxcomplex.cpp:530-568); the dense one-bin grid is the
        # TPU-native equivalent of its final (<1 Hz) resolution.
        lo_bin = int(np.floor(min(los) / bin_hz))
        hi_bin = int(np.ceil(max(his) / bin_hz))
        shifts = np.arange(lo_bin, hi_bin + 1, dtype=np.int32)
        freqs = shifts.astype(np.float64) * bin_hz
        hyp_ok = np.stack(
            [
                (freqs >= self.channels[i].cfg.fc_init_hz
                 - self.channels[i].cfg.acq_range_hz - bin_hz)
                & (freqs <= self.channels[i].cfg.fc_init_hz
                   + self.channels[i].cfg.acq_range_hz + bin_hz)
                for i in cold
            ]
        )
        nsec = b.bps * b.nobs
        # fine-squaring window on the DOUBLED-frequency axis: it only has
        # to absorb the CAF's post-sinc-refinement error (a few Hz), and
        # it must stay narrower than the spacing to other channels'
        # squaring lines — a wide window locks onto a co-channel
        # neighbor's line and detunes fc by a whole code-rate null
        bin2 = self.fs / nsec
        half_doubled = max(6.0 * bin2, 16.0)
        win = 2 * int(np.ceil(half_doubled / bin2)) + 1
        # probe-epoch diversity: the reference re-tries acquisition on a
        # RANDOM epoch each second (rxcomplex.cpp:529) so a transient
        # interference burst cannot blind it forever; here the epoch
        # advances deterministically — attempt k probes code
        # (bps//2 + k*stride) % bps with stride coprime to bps, cycling
        # through every code position of the second
        import math as _math

        bps = int(self.fs) // b.nobs
        stride = max(1, bps // 3)
        while _math.gcd(stride, bps) != 1:
            stride += 1
        start_code = (bps // 2 + self._acq_attempt * stride) % max(bps, 1)
        self._acq_attempt += 1
        start = start_code * b.nobs
        df, pt_idx, snr, pk = banked_acquire_step(
            pending.dev,
            jnp.asarray(b.fcode_ri[cold]),
            jnp.asarray(self._buf_idx[cold]),
            jnp.asarray(shifts),
            jnp.asarray(hyp_ok),
            jnp.asarray(np.int32(start)),
            pending.scale,
            nobs=b.nobs,
            nsec=nsec,
            fs=self.fs,
            win=win,
            chunk=self.acq_chunk,
            real_input=self.real_input,
        )
        df = np.asarray(df)
        pt_idx = np.asarray(pt_idx)
        snr_db = 10.0 * np.log10(np.maximum(np.asarray(snr), 1e-12))
        pk = np.asarray(pk)
        acquired: set[int] = set()
        for j, i in enumerate(cold):
            cfg, st = self.channels[i].cfg, self.states[i]
            if snr_db[j] < cfg.snr_min_db:
                self._log(log_line("acq failed  ", cfg, 0, b.bps))
                continue
            st.fc = float(df[j])
            st.pt = int((start + pt_idx[j]) % b.nobs)
            st.gd = st.pt * 1e9 / self.fs
            st.is_trk = True
            st.is_first = True
            st.pk = float(pk[j])
            acquired.add(i)
            self._log(
                f"acquisition : Ch. {cfg.physical}, PRN#{cfg.prn_id:2d}, "
                f"fc = {st.fc:.0f}, pt = {st.pt}"
            )
        return acquired

    # -- tracking ---------------------------------------------------------
    def _track_all(self, pending: PendingSecond, warm, reports) -> None:
        b = self.bank
        pt = np.array([s.pt for s in self.states], dtype=np.int32)
        fc = np.array([s.fc for s in self.states], dtype=np.float64)
        last_phi = np.array(
            [s.last_phi for s in self.states], dtype=np.float32
        )
        theta, t1, t2 = phase_tables(b, pt, fc)
        step_kw = dict(
            ncodes=b.ncodes, nobs=b.nobs, nlag=b.nlag, bps=b.bps,
            fs=self.fs, real_input=self.real_input, group=self.group,
        )
        if self._dev_const is None:
            self._dev_const = {
                "wav_ext": jnp.asarray(b.wav_ext),
                "psbb": jnp.asarray(b.psbb),
                "buf_idx": jnp.asarray(self._buf_idx),
            }
        scale = (
            pending.scale if pending.scale is not None else jnp.float32(1.0)
        )
        args = (
            pending.dev,
            self._dev_const["wav_ext"],
            self._dev_const["psbb"],
            self._dev_const["buf_idx"],
            jnp.asarray(pt),
            jnp.asarray(theta),
            jnp.asarray(t1),
            jnp.asarray(t2),
            jnp.asarray(last_phi),
        )
        if self._step is not None:
            outs = self._step(*args, scale)
        else:
            outs = banked_track_step(*args, pending.scale, **step_kw)
        # ONE fetch for the whole bank's second (packed rows)
        c0p, c1p, c0g, c1g, chi2, cnt, pk_mean, last_phi_new, locked = (
            unpack_track_outputs(np.asarray(outs))
        )
        px_rows = pending.px_rows

        for i in warm:
            st, cfg = self.states[i], self.channels[i].cfg
            if not locked[i]:
                st.is_trk = False
                st.last_phi = 0.0
                self._log(log_line("lock lost   ", cfg, int(cnt[i]), b.bps))
                continue
            st.fc += float(np.round(c1p[i]))
            st.df = float(c1p[i] - np.round(c1p[i]))
            st.phi = float(np.mod(c0p[i] + 1000.0, 1.0))
            gd_abs = float(c0g[i]) + st.pt * 1e9 / self.fs
            st.sdgd = float(np.sqrt(max(float(chi2[i]), 0.0) / max(int(cnt[i]), 1)))
            st.gd = gd_abs + 0.5 * float(c1g[i])
            st.dg = float(c1g[i])
            st.pt_prev = st.pt
            # wrap by one code period: an unguarded negative pt (delay
            # near 0 mod code, negative drift) would be silently clamped
            # by the device program's dynamic_slice, mis-aligning the
            # next second by |pt| samples (the host twin wraps too;
            # the reference writes it unguarded, rxcomplex.cpp:744)
            st.pt = int(
                np.round((gd_abs + float(c1g[i])) * self.fs / 1e9)
            ) % b.nobs
            st.pk = float(pk_mean[i])
            st.last_phi = float(last_phi_new[i])
            if st.is_first:
                st.is_first = False
                self._log(log_line("code lock   ", cfg, int(cnt[i]), b.bps))
                continue
            px = float(px_rows[self._buf_idx[i]])
            rep = SecondReport(
                fc_hz=st.fc + st.df,
                phi_cycles=st.phi,
                cnt=int(cnt[i]),
                gd_ns=st.gd,
                dg_ns_per_s=st.dg,
                sdgd_ns=st.sdgd,
                pk_dbm=_v2_to_dbm(st.pk),
                pnoise_dbm=_v2_to_dbm(max(px - st.pk, 1e-30)),
                locked=True,
            )
            reports[i] = rep
            if self.out_dir:
                path = os.path.join(self.out_dir, dat_filename(cfg))
                with open(path, "a") as f:
                    f.write(rep.row(b.nobs / self.fs) + "\n")

    def _log(self, line: str) -> None:
        self.log.append(line)
        if self.out_dir:
            with open(os.path.join(self.out_dir, "rxcomplex.log"), "a") as f:
                f.write(line + "\n")


class MultiBankReceiver:
    """Heterogeneous-geometry receiver: one banked program per geometry.

    The banked receiver requires homogeneous (nobs, codes/s, nlag)
    geometry because the lag-bank and phase-table shapes are static per
    program.  ``sdr.param`` permits per-channel chip rates and filter
    settings (``rxcomplex.cpp:272-285``), so a mixed configuration is
    legal; here the channels partition into homogeneous GROUPS, each
    tracked by its own :class:`BankedReceiver` — k jitted programs per
    second for k geometries instead of a per-channel host loop.

    Reports, ``channels`` and ``log`` present in the caller's original
    channel order.  Limitation: SIC reconstruction only sees channels
    within the same group (cross-group MAI cancellation would couple
    the groups' state; the reference's SIC block is single-geometry in
    practice, ``rxcomplex.cpp:506-520``).
    """

    def __init__(
        self,
        channels: list[ChannelConfig],
        fs: float = 5e6,
        **kw,
    ):
        self.fs = fs
        groups: dict[tuple, list[int]] = {}
        for i, c in enumerate(channels):
            sps = int(round(fs / c.chip_rate))
            key = (c.code_len * sps, c.codes_per_second, c.nlag)
            groups.setdefault(key, []).append(i)
        self.n_channels = len(channels)
        self._order: list[list[int]] = []
        self.receivers: list[BankedReceiver] = []
        for idxs in groups.values():
            self._order.append(idxs)
            self.receivers.append(
                BankedReceiver([channels[i] for i in idxs], fs=fs, **kw)
            )

    @property
    def channels(self):
        out = [None] * self.n_channels
        for idxs, rx in zip(self._order, self.receivers):
            for j, i in enumerate(idxs):
                out[i] = rx.channels[j]
        return out

    @property
    def states(self):
        out = [None] * self.n_channels
        for idxs, rx in zip(self._order, self.receivers):
            for j, i in enumerate(idxs):
                out[i] = rx.states[j]
        return out

    @property
    def log(self):
        out: list[str] = []
        for rx in self.receivers:
            out.extend(rx.log)
        return out

    def process_second(self, iq_by_phys):
        reports = [None] * self.n_channels
        for idxs, rx in zip(self._order, self.receivers):
            sub = rx.process_second(iq_by_phys)
            for j, i in enumerate(idxs):
                reports[i] = sub[j]
        return reports
