"""Fibonacci LFSR / m-sequence PRN mathematics.

Behavioral spec: the reference gateware shifts the register right and
inserts ``xor(reg & taps)`` at the MSB each chip, with the LSB as the chip
output (``amaranth_twstft/prn.py:43-47``); its pure-Python oracle is
``nextstate`` (``amaranth_twstft/common.py:23-30``) and the emitted PRN file
is one byte (0/1) per chip, QPSK codes interleaved
(``amaranth_twstft/common.py:59-73``).  The m-sequence taps search
brute-forces the full period (``amaranth_twstft/common.py:32-57``,
``tools/mseq_calculator.c:9-38``); known-good 17-bit taps are listed in
``tools/README.md:2-11``.

This module provides three equivalent implementations:

- a Python-int oracle (arbitrary ``bit_len``),
- a vectorized NumPy batch stepper (the m-sequence search engine),
- a ``lax.scan`` JAX generator (jit-able, used to build replicas on-device).

All three are cross-checked in ``tests/test_lfsr.py``.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lfsr_next",
    "prn_chips",
    "prn_chips_batch",
    "prn_chips_jax",
    "prn_states_np",
    "is_mseq",
    "find_mseq_taps",
    "TapsCache",
    "write_prn_file",
    "read_prn_file",
]


# ----------------------------------------------------------------------
# Python-int oracle
# ----------------------------------------------------------------------
def lfsr_next(state: int, taps: int, bit_len: int) -> int:
    """One LFSR step: right shift, parity(state & taps) into the MSB.

    Matches the gateware shift (``amaranth_twstft/prn.py:43-47``) and the
    host oracle (``amaranth_twstft/common.py:23-30``).
    """
    bit = bin(state & taps).count("1") & 1
    return (state >> 1) | (bit << (bit_len - 1))


def prn_chips(bit_len: int, taps: int, n: int, seed: int = 1) -> np.ndarray:
    """First ``n`` chips (0/1 int8) of the PRN stream.

    Chip i is ``state & 1`` *before* the i-th shift, i.e. the byte stream
    written by ``write_prn_seq`` (``amaranth_twstft/common.py:66-71``).
    Sequences longer than the LFSR period repeat (the reference truncates or
    repeats the m-sequence to ``noiselen`` chips the same way).
    """
    period = (1 << bit_len) - 1
    m = min(n, period)
    out = np.empty(m, dtype=np.int8)
    state = seed
    for i in range(m):
        out[i] = state & 1
        state = lfsr_next(state, taps, bit_len)
    if n <= period:
        return out
    reps = -(-n // period)
    return np.tile(out, reps)[:n]


def prn_chips_batch(
    bit_len: int, taps: np.ndarray, n: int, seed: int = 1
) -> np.ndarray:
    """First ``n`` chips for a BATCH of tap masks -> (len(taps), n) int8.

    Lockstep-vectorized :func:`prn_chips` (same semantics per row): one
    NumPy pass steps every LFSR together, so building a 120-channel
    replica bank costs one walk instead of 120 Python loops
    (``rxcomplex.cpp`` builds its 120 channels' codes serially at
    startup; the TPU-era bank build is batched end to end).
    """
    taps = np.asarray(taps, dtype=np.uint64)
    period = (1 << bit_len) - 1
    m = min(n, period)
    state = np.full(taps.shape, seed, dtype=np.uint64)
    msb = np.uint64(1) << np.uint64(bit_len - 1)
    one = np.uint64(1)
    out = np.empty((len(taps), m), dtype=np.int8)
    for i in range(m):
        out[:, i] = (state & one).astype(np.int8)
        bits = _parity64(state & taps)
        state = (state >> one) | (bits * msb)
    if n <= period:
        return out
    reps = -(-n // period)
    return np.tile(out, (1, reps))[:, :n]


# ----------------------------------------------------------------------
# Vectorized NumPy batch stepper (search engine)
# ----------------------------------------------------------------------
def prn_states_np(
    bit_len: int, taps: np.ndarray, n_steps: int, seed: int = 1
) -> np.ndarray:
    """States after each of ``n_steps`` steps for a batch of taps (uint64)."""
    taps = np.asarray(taps, dtype=np.uint64)
    state = np.full(taps.shape, seed, dtype=np.uint64)
    msb = np.uint64(1) << np.uint64(bit_len - 1)
    for _ in range(n_steps):
        bits = _parity64(state & taps)
        state = (state >> np.uint64(1)) | (bits * msb)
    return state


def _parity64(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> np.uint64(32))
    x = x ^ (x >> np.uint64(16))
    x = x ^ (x >> np.uint64(8))
    x = x ^ (x >> np.uint64(4))
    x = x ^ (x >> np.uint64(2))
    x = x ^ (x >> np.uint64(1))
    return x & np.uint64(1)


def _native_lib():
    """The ctypes handle of the C++ engine, or None (lazy, import-safe)."""
    try:
        from amaranth_twstft_tpu import native

        return native.load()
    except Exception:
        return None


def _is_mseq_py(bit_len: int, taps: int, seed: int = 1) -> bool:
    """Pure-Python oracle (kept as the cross-check for the fast engines)."""
    period = (1 << bit_len) - 1
    s = int(seed)
    for _ in range(period - 1):
        bit = bin(s & taps).count("1") & 1
        s = (s >> 1) | (bit << (bit_len - 1))
        if s == seed or s == 0:
            return False
    return True


def is_mseq(bit_len: int, taps: int, seed: int = 1) -> bool:
    """True iff ``taps`` generates a maximal-length sequence.

    Same criterion as the reference brute force: after 2**bit_len - 2 steps
    the state must not have revisited the seed nor reached 0
    (``amaranth_twstft/common.py:44-51``); equivalently the state sequence
    has period 2**bit_len - 1 (``tools/mseq_calculator.c:31-38``).

    Routed through the C++ engine (``native/mseq.cpp``) when available —
    a 17-bit walk is 131 070 steps, untenable in a Python loop across a
    search; the Python oracle remains as :func:`_is_mseq_py`.
    """
    lib = _native_lib()
    if lib is not None:
        return bool(lib.twstft_is_mseq(bit_len, taps, seed))
    return _is_mseq_py(bit_len, taps, seed)


def _find_mseq_taps_np(
    bit_len: int, limit: int, seed: int = 1, chunk: int = 4096
) -> list[int]:
    """NumPy-batched ascending search: step ``chunk`` candidate tap masks
    in lockstep, eliminating any whose state revisits the seed or reaches
    zero before the full period, compacting survivors as they die."""
    period = (1 << bit_len) - 1
    msb = np.uint64(1) << np.uint64(bit_len - 1)
    seed64 = np.uint64(seed)
    found: list[int] = []
    for start in range(1, 1 << bit_len, 2 * chunk):
        stop = min(start + 2 * chunk, 1 << bit_len)
        cands = np.arange(start, stop, 2, dtype=np.uint64)
        state = np.full(cands.shape, seed, dtype=np.uint64)
        steps_done = 0
        while steps_done < period - 1 and len(cands):
            block = min(1024, period - 1 - steps_done)
            dead = np.zeros(cands.shape, dtype=bool)
            for _ in range(block):
                bits = _parity64(state & cands)
                state = (state >> np.uint64(1)) | (bits * msb)
                dead |= (state == seed64) | (state == 0)
            if dead.any():
                keep = ~dead
                cands, state = cands[keep], state[keep]
            steps_done += block
        found.extend(int(t) for t in cands)
        if len(found) >= limit:
            break
    return found[:limit]


def find_mseq_taps(bit_len: int, limit: int = 10) -> list[int]:
    """First ``limit`` odd tap masks generating m-sequences.

    Mirrors ``m_seq_codes`` (``amaranth_twstft/common.py:32-57``): candidates
    are the odd integers in ascending order (the LSB tap must be set for the
    output bit to feed back).  The walk runs on the C++ engine
    (``native/mseq.cpp``, ``tools/mseq_calculator.c:31-38`` semantics) when
    available, else on the NumPy lockstep batch — both reproduce
    ``config.GOLDEN_TAPS_17`` (``tools/README.md:2-11``) in seconds where
    the old per-step Python loop needed ~10^9 iterations.
    """
    lib = _native_lib()
    if lib is not None:
        import ctypes

        out = (ctypes.c_uint64 * limit)()
        n = lib.twstft_find_mseq(bit_len, out, limit)
        return [int(out[i]) for i in range(n)]
    return _find_mseq_taps_np(bit_len, limit)


# ----------------------------------------------------------------------
# JAX generator
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnums=(0, 2))
def _prn_chips_jax(bit_len: int, taps, n: int, seed):
    taps = jnp.uint32(taps)
    msb_shift = jnp.uint32(bit_len - 1)

    def step(state, _):
        chip = (state & jnp.uint32(1)).astype(jnp.int8)
        bit = jax.lax.population_count(state & taps) & jnp.uint32(1)
        new = (state >> jnp.uint32(1)) | (bit << msb_shift)
        return new, chip

    _, chips = jax.lax.scan(step, jnp.uint32(seed), None, length=n)
    return chips


def prn_chips_jax(bit_len: int, taps: int, n: int, seed: int = 1) -> jax.Array:
    """JAX version of :func:`prn_chips` (``bit_len <= 32``), jit-compiled.

    Uses ``lax.scan`` + ``population_count`` — no data-dependent Python
    control flow, so the whole replica build can live under ``jit``.
    """
    if bit_len > 32:
        raise ValueError("prn_chips_jax supports bit_len <= 32")
    period = (1 << bit_len) - 1
    if n <= period:
        return _prn_chips_jax(bit_len, taps, n, seed)
    base = _prn_chips_jax(bit_len, taps, period, seed)
    reps = -(-n // period)
    return jnp.tile(base, reps)[:n]


# ----------------------------------------------------------------------
# Taps cache — JSON replacement of the pickled ``saved_taps.pickle``
# (``amaranth_twstft/common.py:75-129``); JSON avoids pickle's code-exec
# surface and is diff-able.
# ----------------------------------------------------------------------
class TapsCache:
    def __init__(self, path: str = "taps_cache.json"):
        self.path = path
        self._d: dict[str, list[int]] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._d = json.load(f)

    def get(self, bit_len: int) -> list[int]:
        return list(self._d.get(str(bit_len), []))

    def autofill(self, bit_len: int, nbtaps: int) -> list[int]:
        """Return >= nbtaps cached taps, searching and persisting if absent
        (behavior of ``taps_autofill``, ``amaranth_twstft/common.py:75-91``)."""
        have = self.get(bit_len)
        if len(have) >= nbtaps:
            return have[:nbtaps]
        taps = find_mseq_taps(bit_len, nbtaps)
        self._d[str(bit_len)] = taps
        with open(self.path, "w") as f:
            json.dump(self._d, f, indent=1, sort_keys=True)
        return taps


# ----------------------------------------------------------------------
# PRN file IO — byte-compatible with ``write_prn_seq``
# (``amaranth_twstft/common.py:59-73``): 1 byte per chip, value 0 or 1;
# QPSK interleaves the A and B streams.
# ----------------------------------------------------------------------
def prn_default_filename(bit_len: int, noiselen: int, taps_a: int,
                         taps_b: int | None = None) -> str:
    """Reference naming scheme (``amaranth_twstft/common.py:61``)."""
    suffix = f".{taps_b}q" if taps_b else "b"
    return f"prn{taps_a}{suffix}psk{bit_len}bits.bin"


def write_prn_file(
    path: str,
    bit_len: int,
    noiselen: int,
    taps_a: int,
    taps_b: int | None = None,
    seed: int = 1,
) -> None:
    a = prn_chips(bit_len, taps_a, noiselen, seed)
    if taps_b is None:
        data = a.astype(np.uint8)
    else:
        b = prn_chips(bit_len, taps_b, noiselen, seed)
        data = np.empty(2 * noiselen, dtype=np.uint8)
        data[0::2] = a
        data[1::2] = b
    with open(path, "wb") as f:
        f.write(data.tobytes())


def read_prn_file(path: str, qpsk: bool = False):
    """Read a PRN chip file (0/1 bytes) -> int8 array(s).

    The processing chains read these with ``fread(f,inf,'int8')``
    (``godual_ranging.m:63``) / raw uint8 (``processing/CPP/main.cpp:673``).
    """
    raw = np.fromfile(path, dtype=np.uint8)
    if not qpsk:
        return raw.astype(np.int8)
    return raw[0::2].astype(np.int8), raw[1::2].astype(np.int8)
