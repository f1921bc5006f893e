"""The current per-code aligned tracking chain ("claudio" scripts).

Behavioral spec (``acquisition/claudio_aligned_code_ranging_separate.m``):

- single-channel files ``*_1.bin`` / ``*_2.bin``, consumed in 2-s blocks
  with a leftover carry ``dold`` between blocks (:148, :167, :196-200),
- the first 30 s are skipped while hunting the Doppler line; once
  ``search_df`` validates a spectral candidate the stream restarts from
  the file beginning (:128, :153-160),
- per block, df is refreshed by an argmax within +/-3 bins of the locked
  line (:168-169),
- each 40 ms code window is correlated at that df; when the peak wanders
  from the window edge with sufficient SNR, the stream is re-seeked
  ("MOVED") and the window reprocessed (:171-193),
- outputs: per-code ``xval1``/``indice1``/``correction1``/SNR/power, the
  per-block ``df`` series and the ``moved`` slip list (:207).

TPU-native recast (SURVEY.md §7.3 "data-dependent control flow"): the
sequential per-window loop with mutable ``dindex`` becomes *batched
correlation + masked re-computation*: correlate every window of a block
at its nominal offset, detect the first slip, shift all later windows by
its correction, re-correlate only from that point, and iterate (slips are
rare — sample loss events — so this converges in 0-2 passes).  The
numerics per window are identical; the carry between blocks is the same
``dold`` arithmetic.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from amaranth_twstft_tpu.config import ProcessingConfig, SignalConfig, StationConfig
from amaranth_twstft_tpu.models.godual import build_replica
from amaranth_twstft_tpu.ops.correlator import correlate_epochs
from amaranth_twstft_tpu.ops.doppler import (
    refresh_df,
    search_df_candidates,
    window_mask,
)
from amaranth_twstft_tpu.utils import io, matio

__all__ = ["claudio_df_window", "process_file", "output_name"]


def claudio_df_window(station: StationConfig, ranging: bool) -> tuple[float, float]:
    """Search window on the doubled-frequency axis: +/-8 kHz for the
    loopback/ranging channel, 92..108 kHz (OP-signed) for remote
    (``claudio_...separate.m:135-141``)."""
    if ranging:
        return (-8e3, 8e3)
    if station.op:
        return (-108e3, -92e3)
    return (92e3, 108e3)


def output_name(capture_name: str, remote: bool, ranging: bool) -> str:
    """``remoteclaudio<name>.mat`` / ``rangingclaudio`` / ``localclaudio``
    (``claudio_...separate.m:110-117``)."""
    stem = os.path.basename(capture_name).replace(".bin", ".mat")
    if remote:
        return "remoteclaudio" + stem
    if ranging:
        return "rangingclaudio" + stem
    return "localclaudio" + stem


@dataclass
class _Acc:
    xval: list = field(default_factory=list)
    indice: list = field(default_factory=list)  # non-interpolated grid, float
    correction: list = field(default_factory=list)
    snr_r: list = field(default_factory=list)
    snr_i: list = field(default_factory=list)
    puissance: list = field(default_factory=list)
    df_per_code: list = field(default_factory=list)
    moved: list = field(default_factory=list)  # 1-based epoch indices


def _quantize_q8(a16: np.ndarray) -> tuple[np.ndarray, float]:
    """Chunked int16 -> int8 quantization (``q = round(x/scale)``,
    ``scale = max|x|/127``).  Chunked: whole-buffer float temporaries
    run ~5x slower on a small host (measured, round 3)."""
    CH = 1 << 21
    flat = a16.reshape(-1)
    m = 0
    for i in range(0, flat.size, CH):
        c = flat[i : i + CH]
        m = max(m, int(c.max(initial=0)), -int(c.min(initial=0)))
    scale = m / 127.0 if m else 1.0
    out = np.empty(flat.size, np.int8)
    inv = np.float32(1.0 / scale)
    for i in range(0, flat.size, CH):
        q = np.round(flat[i : i + CH] * inv)
        np.clip(q, -127, 127, out=q)
        out[i : i + CH] = q.astype(np.int8)
    return out.reshape(a16.shape), scale


#: (code_path, L, block, nint, fs, hamming) -> (block_prog, slip_prog,
#: CAP, CARRY); the compiled programs survive across process_file calls
#: so a multi-file session pays the jit/compile-cache load once, not
#: per file.
_RESIDENT_CACHE: dict = {}


def _make_resident_progs(step_packed, L: int, block: int, fs: float):
    """Jitted programs over a ROLLING device-resident sample buffer.

    The f32-pair transfer shipped every block TWICE (df refresh +
    window batch) at 8 B/sample, re-shipped on every slip pass, and
    fetched the nine result fields separately (each d2h round trip
    costs ~25-80 ms of fixed relay latency — measured 63 fetches /
    21.7 s of wait per 10-s file).  Here:

    - only the RAW 2-s block ships, once, as int8 (1 B/component — 8x
      fewer bytes, the same quantized-transfer budget as the pipeline's
      ``parity_ns`` int8 mode).  Because the raw block does not depend
      on the previous block's results, the NEXT block's read + quantize
      + upload overlaps the current block's device work (the host
      issues the async ``device_put`` between dispatch and fetch) —
      without the overlap the per-block host work and fetches serialize
      with the transfers and the chain runs at ~half the link rate
      (measured, round 5),
    - the ``dold`` carry never re-ships: ``block_prog`` assembles
      carry + new block into a fresh f32 buffer ON DEVICE (the carry is
      a slice of the previous assembled buffer, which stays resident),
      runs the df refresh AND the window batch in the same program, and
      returns (df, packed (B, 14) rows, new_buffer) — the buffer output
      is never fetched,
    - slip re-correlations (``slip_prog``) slice the assembled buffer,
      shipping only a fresh offsets vector.

    The df refresh reads the RAW block slice (fixed-length -> one
    compiled program; ``claudio_...separate.m:168-169``); the squaring
    argmax is scale-invariant, so quantized units are as good as volts.
    Buffer geometry: valid prefix = dold_len + block; the carry is a
    fixed CARRY=4L-sample slice starting at ``tail`` (only its first
    ``dold_len`` samples are ever addressed — offsets stop at
    ``dold_len + block - L`` and the refresh starts at ``dold_len``);
    CAP leaves slack so ``tail + CARRY`` can never clamp."""
    CARRY = 4 * L
    CAP = block + 2 * CARRY

    def _wins(x, offsets):
        return jax.vmap(
            lambda o: jax.lax.dynamic_slice(x, (o, jnp.int32(0)), (L, 2))
        )(offsets.astype(jnp.int32))

    @jax.jit
    def block_prog(prev_f32, tail, dold_len, blk_q8, scale, kbon, offsets):
        i32 = jnp.int32
        carry = jax.lax.dynamic_slice(
            prev_f32, (tail.astype(i32), i32(0)), (CARRY, 2)
        )
        x = jnp.zeros((CAP, 2), jnp.float32)
        x = jax.lax.dynamic_update_slice(x, carry, (i32(0), i32(0)))
        blk = blk_q8.astype(jnp.float32) * scale.astype(jnp.float32)
        x = jax.lax.dynamic_update_slice(
            x, blk, (dold_len.astype(i32), i32(0))
        )
        raw = jax.lax.dynamic_slice(
            x, (dold_len.astype(i32), i32(0)), (block, 2)
        )
        d = jax.lax.complex(raw[..., 0], raw[..., 1])
        df, _ = refresh_df(d, fs, kbon.astype(i32))
        packed = step_packed(
            _wins(x, offsets), df_fixed=df.astype(jnp.float32)
        )
        return df, packed, x

    @jax.jit
    def slip_prog(x_f32, offsets, df):
        return step_packed(_wins(x_f32, offsets), df_fixed=df)

    return block_prog, slip_prog, CAP, CARRY


def _decode_packed(packed_np: np.ndarray, n: int):
    """Packed (pad_to, 14) rows -> numpy-backed EpochResult[:n] — no
    further device traffic."""
    from amaranth_twstft_tpu.ops import boundary

    full = boundary.to_epoch_result(boundary.unpack_outputs(packed_np))
    return jax.tree_util.tree_map(lambda a: a[:n], full)


def _correlate_windows(d_block, offsets, rep, proc, df, fs, dtype,
                       step=None, pad_to=0):
    """Correlate windows of ``d_block`` starting at ``offsets`` (host).

    With ``step`` (a bound boundary ranging step), runs on the
    accelerator through real-valued I/O, zero-padded to the fixed batch
    ``pad_to`` so every block reuses the one compiled program (dynamic
    batch sizes would recompile through the axon relay per shape).
    """
    L = rep.samples_per_code
    wins = np.stack([d_block[o : o + L] for o in offsets])
    if step is not None:
        from amaranth_twstft_tpu.ops import boundary

        n = len(offsets)
        if pad_to > n:
            wins = np.concatenate(
                [wins, np.zeros((pad_to - n, L), wins.dtype)]
            )
        outs = step(jnp.asarray(boundary.pack_complex(wins)), df_fixed=df)
        full = boundary.to_epoch_result(outs)
        return jax.tree_util.tree_map(lambda a: a[:n], full)
    res = correlate_epochs(
        jnp.asarray(wins),
        jnp.asarray(rep.fcode),
        jnp.full((len(offsets),), df, dtype=rep.code_interp.dtype),
        rep.code_interp,
        fs,
        nint=proc.nint,
        conjugate_data=True,
        fcode_interp=rep.fcode_interp,
    )
    return res


def process_file(
    capture_path: str,
    code_path: str,
    signal: SignalConfig,
    proc: ProcessingConfig | None = None,
    station: StationConfig | None = None,
    remote: bool = False,
    ranging: bool = True,
    out_dir: str | None = None,
    dtype=jnp.complex128,
    max_slip_passes: int = 4,
    verbose: bool = False,
    transfer: str = "auto",
    df_window_hz: tuple[float, float] | None = None,
) -> dict | None:
    """Run the claudio chain over one single-channel capture file.

    ``transfer`` picks the accelerator sample-transfer path: ``"int8"``
    (and ``"auto"``, the default, on accelerators) keeps each 2-s block
    device-RESIDENT as quantized int8 — one upload per block, df refresh
    + all window (re-)correlations slice it on device
    (:func:`_make_resident_progs`); ``"f32"`` forces the original
    float-pair per-call shipping.  CPU execution ignores it.

    Returns the result dict (or None if the output already exists — the
    reference's idempotent resume, ``claudio_...separate.m:119``).
    """
    proc = proc or ProcessingConfig(
        df_window_hz=(-8e3, 8e3), conjugate_data=True
    )
    station = station or StationConfig()
    out_dir = out_dir or (os.path.dirname(capture_path) or ".")
    out_mat = os.path.join(
        out_dir, output_name(os.path.basename(capture_path), remote, ranging)
    )
    if io.already_done(out_mat):
        return None

    # claudio builds the replica *without* conjugating the code spectrum;
    # the data is conjugated instead (fcode=fft(code), :124)
    rep = build_replica(code_path, signal, proc, conjugate=False, dtype=dtype)
    L = rep.samples_per_code
    fs = signal.fs
    block = int(fs * proc.block_seconds)  # complex samples per block
    # df hunt window: the production Hz constants by default
    # (claudio_...separate.m:135-141); an explicit override supports
    # non-production sample rates (scaled test geometries)
    lo_hz, hi_hz = (
        df_window_hz if df_window_hz is not None
        else claudio_df_window(station, ranging)
    )
    np_dtype = np.complex128 if dtype == jnp.complex128 else np.complex64

    from amaranth_twstft_tpu.ops import boundary

    accel = boundary.on_accelerator()
    step = None
    pad_to = 0
    resident = accel and transfer in ("auto", "int8")
    if accel and not resident:
        # (resident mode never calls this step — its windows run
        # through the cached packed programs below; building it anyway
        # would upload several MB of replica constants per file)
        step = boundary.make_ranging_step(
            np.asarray(rep.fcode), np.asarray(rep.code_interp),
            np.ones(L, bool), fs, nint=proc.nint, conjugate_data=True,
        )
        pad_to = block // L + 2  # max windows in a carry-extended block
    if resident:
        from amaranth_twstft_tpu import native as _native

        # the cache key must cover everything that shapes the compiled
        # replica constants: hamming_window changes rep.fcode itself
        rk = (os.path.abspath(code_path), L, block, proc.nint, float(fs),
              bool(proc.hamming_window))
        if rk not in _RESIDENT_CACHE:
            step_packed = boundary.make_ranging_step(
                np.asarray(rep.fcode), np.asarray(rep.code_interp),
                np.ones(L, bool), fs, nint=proc.nint, conjugate_data=True,
                packed=True,
            )
            _RESIDENT_CACHE[rk] = _make_resident_progs(
                step_packed, L, block, fs
            )
        block_prog, slip_prog, cap_res, carry_res = _RESIDENT_CACHE[rk]
        # windows are sliced on device; pad_to covers the largest
        # window count of a carry-extended (dold + block) buffer
        pad_to = (block + carry_res) // L

    acc = _Acc()
    n_total = io.n_samples_sc16(capture_path, channels=1)

    # ---- df hunt: scan blocks from 30 s on until a line validates ------
    mask = window_mask(block, fs, lo_hz, hi_hz)
    kbon = -1
    start = int(proc.skip_seconds * fs)
    pos = start
    dev_fcode_ri = dev_mask = None
    if accel and pos + block <= n_total:
        # hoisted device constants: a late-validating (or absent)
        # Doppler line would otherwise re-ship the replica spectrum and
        # mask on every 2-s hunt block over the byte-rate-bound link
        dev_fcode_ri = jnp.asarray(
            boundary.pack_complex(np.asarray(rep.fcode))
        )
        dev_mask = jnp.asarray(mask)
    while pos + block <= n_total:
        if resident:
            # int8 hunt: both detection statistics are ratios, so the
            # quantized block needs no scale (doppler ri-wrapper notes)
            blk16, nf = _native.read_raw16(capture_path, pos, block,
                                           channels=1)
            if nf < block:
                break
            n = 1
            q8, _sc = _quantize_q8(blk16)
            dc = blk16[:L].astype(np.float32)
            dc -= dc.mean(axis=0, keepdims=True)
            from amaranth_twstft_tpu.ops.doppler import (
                search_df_candidates_ri,
            )

            kb, _ = search_df_candidates_ri(
                jnp.asarray(q8),
                jnp.asarray(dc),
                dev_fcode_ri,
                fs,
                dev_mask,
                threshold=proc.df_threshold,
            )
            kbon = int(kb)
            if kbon >= 0:
                break
            pos += block
            continue
        d, n = io.read_sc16_epochs(capture_path, pos, 1, block, channels=1,
                                  dtype=np_dtype)
        if n == 0:
            break
        dblk = d[0, 0]
        if accel:
            from amaranth_twstft_tpu.ops.doppler import search_df_candidates_ri

            kb, _ = search_df_candidates_ri(
                jnp.asarray(boundary.pack_complex(dblk)),
                jnp.asarray(
                    boundary.pack_complex(dblk[:L] - dblk[:L].mean())
                ),
                dev_fcode_ri,
                fs,
                dev_mask,
                threshold=proc.df_threshold,
            )
            kbon = int(kb)
        else:
            kbon, _ = search_df_candidates(
                jnp.asarray(dblk),
                jnp.asarray(dblk[:L] - dblk[:L].mean()),
                jnp.asarray(rep.fcode),
                fs,
                mask,
                threshold=proc.df_threshold,
            )
        if kbon >= 0:
            break
        pos += block
    # release the hunt constants' device pins before the main loop
    # (the mask alone is ~40 MB f32 at production block length)
    del dev_fcode_ri, dev_mask
    if kbon < 0:
        # no signal found in the whole file
        matio.save_claudio_style(out_mat, _acc_asdict(acc), code=rep.code)
        return {"mat_path": out_mat, "found": False}

    # ---- main loop from the file start (the reference rewinds) --------
    pos = 0
    dold = np.zeros(0, dtype=np_dtype)
    p = 1  # 1-based epoch counter like the reference printouts
    if resident:
        prev_f32 = None  # rolling assembled buffer, device-resident
        tail16 = 0  # carry start within prev_f32
        dold_len = 0
        pending = None  # (dev_q8, scale): next raw block, upload issued
        at_eof = False  # the prefetch already saw the short tail
    while True:
        if resident:
            if pending is None:
                if at_eof:
                    break  # the reference drops the final partial block
                blk16, nf = _native.read_raw16(capture_path, pos, block,
                                               channels=1)
                if nf < block:
                    break  # the reference drops the final partial block
                q8, scale = _quantize_q8(blk16)
                pending = (jax.device_put(q8), scale)
                pos += block
            dev_q8, scale = pending
            pending = None
            n = 1
            if dold_len > carry_res:  # pathological slip pile-up
                acc.moved.append(-p)  # negative marker: carry trimmed
                tail16 += dold_len - carry_res
                dold_len = carry_res
            dcat_len = dold_len + block
            offsets = np.arange(0, dcat_len - L + 1, L, dtype=np.int64)
            n_win = len(offsets)
            offs0 = np.zeros(pad_to, np.int32)
            offs0[:n_win] = offsets
            if prev_f32 is None:
                prev_f32 = jnp.zeros((cap_res, 2), jnp.float32)
            # carry assembly + df refresh + window batch in ONE program
            df_dev, packed_dev, x_f32 = block_prog(
                prev_f32, jnp.int32(tail16), jnp.int32(dold_len),
                dev_q8, jnp.float32(scale), jnp.int32(kbon),
                jnp.asarray(offs0),
            )
            # PREFETCH: the next raw block's read + quantize + upload
            # rides the link while this block computes (device_put is
            # async; the raw block depends on nothing downstream)
            blk16, nf = _native.read_raw16(capture_path, pos, block,
                                           channels=1)
            if nf == block:
                q8, scale_n = _quantize_q8(blk16)
                pending = (jax.device_put(q8), scale_n)
                pos += block
            else:
                at_eof = True  # don't re-read the short tail next loop
            packed = np.asarray(packed_dev)  # ONE result fetch per block
            df_val = float(np.asarray(df_dev))
            res = _decode_packed(packed, n_win)
            prev_f32 = x_f32
        else:
            d, n = io.read_sc16_epochs(capture_path, pos, 1, block,
                                      channels=1, dtype=np_dtype)
            if n == 0:
                break
            pos += block
            dcat = np.concatenate([dold, d[0, 0]])
            dcat_len = len(dcat)
            # df refresh within +/-3 bins of the locked line (:168-169).
            # The reference refreshes on the carry-extended block; we
            # refresh on the fixed-length raw block so every refresh
            # compiles to the one cached program (variable-length FFTs
            # would recompile per block).
            if accel:
                from amaranth_twstft_tpu.ops.doppler import refresh_df_ri

                df_val = float(
                    refresh_df_ri(
                        jnp.asarray(boundary.pack_complex(d[0, 0])), fs,
                        kbon
                    )[0]
                )
            else:
                df_val = float(refresh_df(jnp.asarray(d[0, 0]), fs, kbon)[0])

            # ---- batched window extraction -----------------------------
            offsets = np.arange(0, dcat_len - L + 1, L, dtype=np.int64)
            if len(offsets) == 0:
                dold = dcat
                continue
            n_win = len(offsets)

        # ---- masked slip recompute ------------------------------------
        def corr(offs):
            # slip re-correlation: the buffer is already resident — only
            # the fresh offsets vector ships
            if resident:
                o = np.zeros(pad_to, np.int32)
                o[: len(offs)] = offs
                pk = np.asarray(slip_prog(
                    x_f32, jnp.asarray(o), jnp.float32(df_val),
                ))
                return _decode_packed(pk, len(offs))
            return _correlate_windows(dcat, offs, rep, proc, df_val, fs,
                                      dtype, step=step, pad_to=pad_to)

        if not resident:
            res = corr(offsets)

        for _pass in range(max_slip_passes):
            ind3 = np.asarray(res.indice, dtype=np.float64)
            indice_ni = ind3 / proc.interp_factor  # non-interp grid (0-based)
            # host-side dB (the EpochResult property would round-trip
            # numpy-backed fields through the device)
            snr_db = 10.0 * np.log10(np.maximum(
                np.asarray(res.snr_r) + np.asarray(res.snr_i), 1e-30
            ))
            # slip: peak away from either window edge with usable SNR
            # (:175-186; indices there are 1-based -> >43 & <len/2 etc.)
            slipped = (snr_db > proc.snr_gate_db) & (
                ((indice_ni > 42) & (indice_ni < L / 2))
                | ((indice_ni < L - 3) & (indice_ni >= L / 2))
            )
            first = int(np.argmax(slipped)) if slipped.any() else -1
            if first < 0:
                break
            # re-seek: dindex -= indice - 21 (+L if it would go negative)
            shift = int(round(indice_ni[first])) - 21
            offsets = offsets.copy()
            offsets[first:] = offsets[first:] - shift
            if offsets[first] < 0:
                offsets[first:] += L
            # drop windows that no longer fit
            keep = offsets + L <= dcat_len
            offsets = offsets[keep]
            n_win = len(offsets)
            if n_win == 0:
                break
            acc.moved.append(p + first)
            # resident mode: the buffer is already on device — the
            # re-correlation ships only the new offsets vector
            res = corr(offsets)

        if n_win:
            ind3 = np.asarray(res.indice, dtype=np.float64)
            acc.indice.extend((ind3 / proc.interp_factor).tolist())
            acc.correction.extend(np.asarray(res.correction).tolist())
            acc.xval.extend(np.asarray(res.xval).tolist())
            acc.snr_r.extend(np.asarray(res.snr_r).tolist())
            acc.snr_i.extend(np.asarray(res.snr_i).tolist())
            acc.puissance.extend(np.asarray(res.puissance).tolist())
            acc.df_per_code.extend([df_val] * n_win)
            if verbose:
                vdb = 10.0 * np.log10(np.maximum(
                    np.asarray(res.snr_r) + np.asarray(res.snr_i), 1e-30
                ))
                for i in range(n_win):
                    print(
                        f"{p+i}\t{(ind3[i]+np.asarray(res.correction)[i])/fs/proc.interp_factor:.12f}"
                        f"\t{df_val:.3f}\t{float(vdb[i]):.1f}"
                    )
            p += n_win
            tail = offsets[-1] + L
        else:
            tail = 0
        if resident:
            tail16 = int(tail)  # carry start within x_f32 coordinates
            dold_len = dcat_len - tail16
        else:
            dold = dcat[tail:]
        if n < 1:
            # NOTE: like the reference, the final PARTIAL block (and its
            # dold carry) is dropped — its fread loop exits on any short
            # read (``do ... until (longueur != fs*2*ls)``,
            # claudio_...separate.m:147,205), so up to block-1 samples at
            # EOF never correlate.  read_sc16_epochs drops short tails,
            # making n == 0 the (only) exit; a `len < block` guard here
            # was dead code.
            break

    matio.save_claudio_style(out_mat, _acc_asdict(acc), code=rep.code,
                             moved=acc.moved)
    return {
        "mat_path": out_mat,
        "found": True,
        "indice": np.asarray(acc.indice),
        "correction": np.asarray(acc.correction),
        "xval": np.asarray(acc.xval),
        "snr_r": np.asarray(acc.snr_r),
        "snr_i": np.asarray(acc.snr_i),
        "df": np.asarray(acc.df_per_code),
        "moved": acc.moved,
    }


def _acc_asdict(acc: _Acc) -> dict:
    return {
        "indice": np.asarray(acc.indice),
        "correction": np.asarray(acc.correction),
        "snr_r": np.asarray(acc.snr_r),
        "snr_i": np.asarray(acc.snr_i),
        "df": np.asarray(acc.df_per_code),
        "puissance": np.asarray(acc.puissance),
        "xval": np.asarray(acc.xval),
    }
