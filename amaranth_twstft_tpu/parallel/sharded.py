"""Sharded CAF ranging: time-block x Doppler-hypothesis mesh execution.

One ``shard_map``-ped step subsumes the reference's whole concurrency
inventory (SURVEY.md §2.6):

- each ``time`` shard holds one contiguous block of epochs; the
  overlap-save halo (first samples of the *next* block) arrives via
  ``lax.ppermute`` — mathematically the ``dold`` carry buffer of
  ``claudio_...separate.m:167,196-200`` turned into a collective,
- each ``channel`` shard evaluates a slice of the Doppler grid (the
  DLL/PLL per-channel loop, ``rxcomplex.cpp:466-799``); the winning
  hypothesis is chosen by an ``all_gather`` peak reduction (replacing the
  per-thread argmax + semaphore join of ``processing/CPP/main.cpp:488-497``),
- the final correlation at the winning frequency runs redundantly on every
  channel shard (cheaper than a broadcast round-trip at these sizes).

Results are identical at any shard count — asserted by
``tests/test_sharded.py``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from amaranth_twstft_tpu.ops.caf import caf_peaks
from amaranth_twstft_tpu.ops.correlator import correlate_epochs

__all__ = [
    "make_sharded_caf_step",
    "make_sharded_lagbank_step",
    "shard_blocks",
    "shard_blocks_multihost",
]


def shard_blocks(mesh: Mesh, blocks, offsets, fcode, code_interp, shifts):
    """Device-put the step inputs with their intended shardings.

    The Doppler grid is padded (by repeating its last hypothesis) to a
    multiple of the channel-axis size — duplicate hypotheses are harmless
    in an argmax reduction.
    """
    t, c = mesh.axis_names
    n_c = mesh.shape[c]
    pad = (-shifts.shape[0]) % n_c
    if pad:
        shifts = jnp.concatenate([shifts, jnp.repeat(shifts[-1:], pad)])
    put = jax.device_put
    return (
        put(blocks, NamedSharding(mesh, P(t, None))),
        put(offsets, NamedSharding(mesh, P(t))),
        put(fcode, NamedSharding(mesh, P())),
        put(code_interp, NamedSharding(mesh, P())),
        put(shifts, NamedSharding(mesh, P(c))),
    )


def shard_blocks_multihost(
    mesh: Mesh, local_blocks, local_offsets, fcode, code_interp, shifts
):
    """Multi-host :func:`shard_blocks`: each process contributes its LOCAL
    time blocks (the per-host capture segment it ingested), assembled into
    one global array without any host ever holding the whole stream —
    the jax.distributed replacement for the reference's scp/rsync record
    shipping (``experiments/221219_twoway/README.md:4-10``, SURVEY.md
    §2.6 "remote-host offload").

    ``local_blocks``: (n_time_local, block+halo) — this process's
    contiguous share of the time axis, in process order.  Replicated
    constants (replica spectra, Doppler grid) are identical on every host.
    """
    t, c = mesh.axis_names
    n_c = mesh.shape[c]
    pad = (-shifts.shape[0]) % n_c
    if pad:
        shifts = jnp.concatenate([shifts, jnp.repeat(shifts[-1:], pad)])
    mk = jax.make_array_from_process_local_data
    return (
        mk(NamedSharding(mesh, P(t, None)), np.asarray(local_blocks)),
        mk(NamedSharding(mesh, P(t)), np.asarray(local_offsets)),
        jax.device_put(fcode, NamedSharding(mesh, P())),
        jax.device_put(code_interp, NamedSharding(mesh, P())),
        jax.device_put(shifts, NamedSharding(mesh, P(c))),
    )


def make_sharded_caf_step(
    mesh: Mesh,
    fs: float,
    L: int,
    epochs_per_block: int,
    halo: int,
    *,
    nint: int = 1,
    caf_chunk: int = 4,
    fast: bool = False,
    mxu_fft: bool = False,
    real_io: bool = False,
):
    """Build the jitted sharded step.

    ``real_io=True`` moves the program boundary to real dtypes: the step
    then takes ``blocks_ri`` (n_time, len, 2) float32 and ``fcode_ri``
    (L, 2) float32 and returns ``xval`` as (..., 2) re/im — required on
    relay-attached accelerators where complex arrays cannot cross the
    host<->device boundary (see ``ops/boundary.py``), and what the
    device-side pipeline uses.

    Returns ``step(blocks, offsets, fcode, code_interp, shifts)`` where

    - ``blocks``: (n_time, epochs_per_block*L + halo) complex — contiguous
      stream blocks with ``halo`` trailing samples.  Interior shards
      re-fetch their halo from the next shard via ppermute (callers may
      zero those regions); the LAST shard — which has no successor —
      uses its host-supplied trailing halo verbatim, so fill it with the
      true stream continuation (or zeros at end of capture),
    - ``offsets``: (n_time,) int32 in [0, halo) — per-block epoch start
      (the slip re-seek state, ``claudio_...separate.m:180-186``),
    - ``shifts``: (n_hyp,) int32 Doppler spectrum-roll hypotheses,

    and returns per-epoch arrays of shape (n_time, epochs_per_block):
    ``delay_samples`` (on the fs grid, interpolated), ``df_hz``,
    ``peak_power``, ``snr_db``, ``xval``.
    """
    t_axis, c_axis = mesh.axis_names
    n_time = mesh.shape[t_axis]
    block_len = epochs_per_block * L

    def local_step(blocks_l, offsets_l, fcode_l, code3_l, shifts_l):
        # shapes: blocks_l (1, block_len+halo), offsets_l (1,),
        # shifts_l (n_hyp_local,)
        block = blocks_l[0]
        off = offsets_l[0]

        # ---- overlap-save halo exchange (the `dold` carry) ----------
        # interior shards fetch their halo from the NEXT shard's head;
        # the LAST shard has no successor — the ring would hand it the
        # FIRST shard's head (bytes from the start of the capture), so
        # it uses the host-supplied trailing halo instead (the stream
        # continuation when the ingest provides it, zeros otherwise)
        perm = [(i, (i - 1) % n_time) for i in range(n_time)]
        halo_recv = jax.lax.ppermute(
            block[:halo][None], t_axis, perm=perm
        )[0]
        is_last = jax.lax.axis_index(t_axis) == n_time - 1
        tail = jnp.where(is_last, block[block_len : block_len + halo],
                         halo_recv)
        ext = jnp.concatenate([block[:block_len], tail])

        # ---- epoch extraction at the slip offset --------------------
        d = jax.lax.dynamic_slice(ext, (off,), (block_len,)).reshape(
            epochs_per_block, L
        )

        # ---- local Doppler slice of the CAF -------------------------
        peaks = caf_peaks(d, fcode_l, shifts_l, chunk=caf_chunk)
        h_loc = jnp.argmax(peaks.power, axis=-1)  # (B,)
        p_loc = jnp.take_along_axis(peaks.power, h_loc[..., None], -1)[..., 0]
        f_loc = (
            jnp.take(shifts_l, h_loc).astype(p_loc.dtype) * (fs / L)
        )

        # ---- collective peak reduction over the channel axis --------
        p_all = jax.lax.all_gather(p_loc, c_axis)  # (n_ch, B)
        f_all = jax.lax.all_gather(f_loc, c_axis)
        win = jnp.argmax(p_all, axis=0)  # (B,)
        best_p = jnp.take_along_axis(p_all, win[None], 0)[0]
        best_f = jnp.take_along_axis(f_all, win[None], 0)[0]

        # ---- full correlation at the winning frequency --------------
        # (fast/mxu_fft: the single-chip perf paths, ops/zoomdft.py and
        # ops/mxufft.py, compose with the sharding unchanged)
        res = correlate_epochs(
            d, fcode_l, best_f, code3_l, fs, nint=nint,
            fast=fast, mxu_fft=mxu_fft,
        )
        delay = (res.indice + res.correction) / (2 * nint + 1)
        return (
            delay[None],
            best_f[None],
            best_p[None],
            res.snr_db[None],
            res.xval[None],
        )

    in_specs = (P(t_axis, None), P(t_axis), P(), P(), P(c_axis))
    out_specs = (P(t_axis, None),) * 5

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    if not real_io:
        return jax.jit(step)

    @jax.jit
    def step_ri(blocks_ri, offsets, fcode_ri, code_interp, shifts):
        blocks = jax.lax.complex(blocks_ri[..., 0], blocks_ri[..., 1])
        fcode = jax.lax.complex(fcode_ri[..., 0], fcode_ri[..., 1])
        delay, f, p, snr, xval = step(
            blocks, offsets, fcode, code_interp, shifts
        )
        return delay, f, p, snr, jnp.stack([xval.real, xval.imag], -1)

    return step_ri


def make_sharded_lagbank_step(mesh: Mesh, axis: str | None = None):
    """Multi-channel DLL/PLL lag-bank correlation sharded by receiver channel.

    The reference tracks up to 120 channels with one DGEMM each per second
    on one node (``rxcomplex.cpp:36,605``); here the channel axis is laid
    out across devices (SURVEY.md §2.6 "channels × Doppler hypotheses
    sharded across chips") and each device runs its local channels' MXU
    lag-bank contraction — no collectives needed until the host gathers
    the tiny (codes, nlags) outputs.

    Returns ``step(obs_ri, wav_lags) -> (power, phase)`` with
    ``obs_ri``: (C, 2, codes, nobs) float32 and ``wav_lags``:
    (C, nobs, nlags) float32, C a multiple of the axis size.  Results are
    shard-count invariant (``tests/test_sharded.py``).

    ``phase`` keeps the reference's ``atan2(-im, re)`` convention — the
    CONJUGATE of the residual carrier phase; negate before feeding a
    carrier loop (see ``ops/lagbank.lag_bank_correlate`` and PARITY.md
    deviation 8).
    """
    from amaranth_twstft_tpu.ops.lagbank import lag_bank_correlate

    if axis is None:
        axis = mesh.axis_names[-1]

    def local(obs_l, wav_l):
        return jax.vmap(lag_bank_correlate)(obs_l, wav_l)

    step = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(step)
