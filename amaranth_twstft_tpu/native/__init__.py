"""ctypes bindings for the native C++ host-side components.

Builds ``libtwstft_native.so`` on first use (g++, no external deps) and
exposes:

- :func:`ingest_epochs` / :func:`ingest_decimated` / :func:`write_sc16` —
  mmap + threaded sc16 ingest producing the float32 (..., 2) boundary
  layout directly,
- :func:`file_frames` / :func:`file_mtime` — capture sizing and the
  ``stat.c`` end-of-capture timestamp recovery,
- :func:`save_mat` — dependency-free MAT v5 writer (GoRanging::save
  field conventions),
- :func:`is_mseq` / :func:`find_mseq` / :func:`prn_chips` — the fast
  LFSR engine.

Every entry point has a NumPy fallback so the package works where no
compiler is available; ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libtwstft_native.so")
_SOURCES = ["ingest.cpp", "matwriter.cpp", "mseq.cpp"]

_lock = threading.Lock()
_lib = None
_build_failed = False
HAVE_NATIVE = False


def _build() -> bool:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    base = [
        "g++", "-O3", "-fno-math-errno", "-shared", "-fPIC", "-pthread",
        "-std=c++17", "-o", _SO, *srcs,
    ]
    # -march=native first: the quantize/deinterleave loops vectorize to
    # AVX2/AVX-512 where available (the host convert is the binding term
    # of the capture-hour model; -fno-math-errno lets lrintf lower to
    # cvtps2dq — measured 770 -> 1235 MB/s); plain -O3 as the portable
    # fallback
    for extra in (["-march=native"], []):
        cmd = base[:1] + extra + base[1:]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, HAVE_NATIVE, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            # a failed build stays failed for this process: callers hit
            # load() per batch/file, and re-running two g++ attempts
            # (120 s timeout each) on every call would turn the Python
            # fallback path into minutes of repeated compiles
            return None
        if not os.path.exists(_SO) or any(
            os.path.getmtime(os.path.join(_HERE, s)) > os.path.getmtime(_SO)
            for s in _SOURCES
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.twstft_file_frames.restype = ctypes.c_int64
        lib.twstft_file_frames.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.twstft_file_mtime.restype = ctypes.c_double
        lib.twstft_file_mtime.argtypes = [ctypes.c_char_p]
        lib.twstft_ingest_file.restype = ctypes.c_int64
        lib.twstft_ingest_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.c_int,
        ]
        lib.twstft_ingest_decimated.restype = ctypes.c_int64
        lib.twstft_ingest_decimated.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.twstft_quantize_q8.restype = ctypes.c_int64
        lib.twstft_quantize_q8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.twstft_read_raw16.restype = ctypes.c_int64
        lib.twstft_read_raw16.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ]
        lib.twstft_write_sc16.restype = ctypes.c_int64
        lib.twstft_write_sc16.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.c_int64,
        ]
        lib.twstft_mat_open.restype = ctypes.c_void_p
        lib.twstft_mat_open.argtypes = [ctypes.c_char_p]
        lib.twstft_mat_write_real.restype = ctypes.c_int
        lib.twstft_mat_write_real.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.twstft_mat_write_complex.restype = ctypes.c_int
        lib.twstft_mat_write_complex.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.twstft_mat_close.restype = ctypes.c_int
        lib.twstft_mat_close.argtypes = [ctypes.c_void_p]
        lib.twstft_is_mseq.restype = ctypes.c_int
        lib.twstft_is_mseq.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64
        ]
        lib.twstft_find_mseq.restype = ctypes.c_int
        lib.twstft_find_mseq.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int
        ]
        lib.twstft_prn_chips.restype = None
        lib.twstft_prn_chips.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        HAVE_NATIVE = True
        return lib


def _chan_ptrs(arrs):
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(arrs))()
    for i, a in enumerate(arrs):
        ptrs[i] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    return ptrs


def file_frames(path: str, channels: int = 2) -> int:
    lib = load()
    if lib:
        return int(lib.twstft_file_frames(path.encode(), channels))
    return os.path.getsize(path) // (4 * channels)


def file_mtime(path: str) -> float:
    lib = load()
    if lib:
        return float(lib.twstft_file_mtime(path.encode()))
    return os.path.getmtime(path)


def ingest_epochs(
    path: str,
    start_sample: int,
    n_epochs: int,
    samples_per_epoch: int,
    channels: int = 2,
    n_threads: int = 4,
):
    """Read epochs as float32 (channels, n, L, 2) — TPU boundary layout.

    Native path: mmap + threaded deinterleave; fallback: numpy memmap.
    Returns (array, n_read).
    """
    lib = load()
    want = n_epochs * samples_per_epoch
    if lib:
        bufs = [
            np.empty(2 * want, dtype=np.float32) for _ in range(channels)
        ]
        n = int(
            lib.twstft_ingest_file(
                path.encode(), channels, start_sample, want,
                _chan_ptrs(bufs), n_threads,
            )
        )
        if n < 0:
            raise OSError(f"ingest failed: {path}")
        n_full = n // samples_per_epoch
        out = np.stack(
            [
                b[: 2 * n_full * samples_per_epoch].reshape(
                    n_full, samples_per_epoch, 2
                )
                for b in bufs
            ]
        )
        return out, n_full
    # numpy fallback through utils.io
    from amaranth_twstft_tpu.utils import io

    z, n_full = io.read_sc16_epochs(
        path, start_sample, n_epochs, samples_per_epoch, channels
    )
    out = np.empty(z.shape + (2,), dtype=np.float32)
    out[..., 0] = z.real
    out[..., 1] = z.imag
    return out, n_full


def ingest_decimated(path: str, decim: int, channels: int = 2):
    """Every decim-th sample as float32 (channels, m, 2)."""
    lib = load()
    total = file_frames(path, channels)
    m = (total + decim - 1) // decim
    if lib:
        bufs = [np.empty(2 * m, dtype=np.float32) for _ in range(channels)]
        n = int(
            lib.twstft_ingest_decimated(
                path.encode(), channels, decim, _chan_ptrs(bufs)
            )
        )
        if n < 0:
            raise OSError(f"decimated ingest failed: {path}")
        return np.stack([b[: 2 * n].reshape(n, 2) for b in bufs])
    from amaranth_twstft_tpu.utils import io

    z = io.decimate_sc16(path, decim, channels)
    out = np.empty(z.shape + (2,), dtype=np.float32)
    out[..., 0] = z.real
    out[..., 1] = z.imag
    return out


def quantize_q8(
    path: str,
    start_frame: int,
    n_frames: int,
    channels: int = 2,
    select: int = -1,
    pow2: bool = False,
    n_threads: int = 0,
    decim: int = 0,
):
    """Threaded native int8 quantization of an sc16 frame range.

    Returns ``(q, n, scale[, dec])``: ``q`` is int8 of shape
    ``(n, width)`` with ``width = 2*channels`` (or 2 with ``select``),
    bit-for-bit identical to ``utils/io.read_sc16_epochs_q8``'s Python
    paths.  ``decim > 0`` also returns every decim-th frame as float32
    ``(m, width)`` — the df pre-pass read fused into the quantize pass.
    Raises RuntimeError when the native library is unavailable (callers
    fall back to the Python path).
    """
    lib = load()
    if not lib:
        raise RuntimeError("native library unavailable")
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 2, 8)
    width = 2 if select >= 0 else 2 * channels
    q = np.empty((n_frames, width), dtype=np.int8)
    scale = ctypes.c_double(1.0)
    dec_n = ctypes.c_int64(0)
    if decim > 0:
        m_cap = (n_frames + decim - 1) // decim
        dec = np.empty((m_cap, width), dtype=np.float32)
        dec_ptr = dec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        dec = None
        dec_ptr = ctypes.POINTER(ctypes.c_float)()
    n = int(
        lib.twstft_quantize_q8(
            path.encode(), channels, start_frame, n_frames,
            select, 1 if pow2 else 0,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.byref(scale), n_threads, decim, dec_ptr,
            ctypes.byref(dec_n),
        )
    )
    if n < 0:
        raise OSError(f"quantize failed: {path}")
    if decim > 0:
        return q[:n], n, float(scale.value), dec[: int(dec_n.value)]
    return q[:n], n, float(scale.value)


def read_raw16(
    path: str,
    start_frame: int,
    n_frames: int,
    channels: int = 2,
    select: int = -1,
    n_threads: int = 0,
):
    """Raw int16 frame-range copy (the sc16 ship-the-wire-format ingest).

    Returns ``(a, n)`` with ``a`` int16 of shape ``(n, width)``.  NumPy
    memmap fallback when the native library is unavailable.
    """
    lib = load()
    width = 2 if select >= 0 else 2 * channels
    if lib:
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 2, 8)
        a = np.empty((n_frames, width), dtype=np.int16)
        n = int(
            lib.twstft_read_raw16(
                path.encode(), channels, start_frame, n_frames, select,
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n_threads,
            )
        )
        if n < 0:
            raise OSError(f"raw16 read failed: {path}")
        return a[:n], n
    from amaranth_twstft_tpu.utils import io

    mm = io.open_sc16(path, channels)
    total = mm.shape[0]
    avail = max(0, total - start_frame)
    n = min(n_frames, avail)
    sl = mm[start_frame : start_frame + n]
    if select >= 0:
        sl = sl[:, 2 * select : 2 * select + 2]
    return np.array(sl), n


def write_sc16(path: str, *channels_ri: np.ndarray) -> int:
    """Write float32 (n, 2) channels as an interleaved sc16 file."""
    lib = load()
    if lib:
        arrs = [
            np.ascontiguousarray(c, dtype=np.float32).reshape(-1)
            for c in channels_ri
        ]
        n = len(arrs[0]) // 2
        return int(
            lib.twstft_write_sc16(
                path.encode(), len(arrs), _chan_ptrs(arrs), n
            )
        )
    from amaranth_twstft_tpu.utils import io

    zs = [np.asarray(c[..., 0]) + 1j * np.asarray(c[..., 1]) for c in channels_ri]
    io.write_sc16(path, *zs)
    return len(zs[0])


def save_mat(path: str, fields: dict[str, np.ndarray]) -> None:
    """Write a MAT v5 file of double column vectors (real or complex).

    Native writer when available (the C++ ``GoRanging::save`` role,
    ``processing/CPP/main.cpp:521-656``); scipy fallback otherwise.
    """
    lib = load()
    if not lib:
        import scipy.io as sio

        sio.savemat(path, {k: np.asarray(v).reshape(-1, 1) for k, v in fields.items()})
        return
    h = lib.twstft_mat_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        for name, arr in fields.items():
            a = np.asarray(arr)
            if np.iscomplexobj(a):
                re = np.ascontiguousarray(a.real, dtype=np.float64)
                im = np.ascontiguousarray(a.imag, dtype=np.float64)
                rc = lib.twstft_mat_write_complex(
                    h, name.encode(),
                    re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    a.size,
                )
            else:
                re = np.ascontiguousarray(a, dtype=np.float64)
                rc = lib.twstft_mat_write_real(
                    h, name.encode(),
                    re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    a.size,
                )
            if rc != 0:
                raise OSError(f"mat write failed for {name}: {rc}")
    finally:
        lib.twstft_mat_close(h)


def is_mseq(bit_len: int, taps: int, seed: int = 1) -> bool:
    lib = load()
    if lib:
        return bool(lib.twstft_is_mseq(bit_len, taps, seed))
    from amaranth_twstft_tpu.ops import lfsr

    return lfsr.is_mseq(bit_len, taps, seed)


def find_mseq(bit_len: int, limit: int = 10) -> list[int]:
    lib = load()
    if lib:
        out = (ctypes.c_uint64 * limit)()
        n = lib.twstft_find_mseq(bit_len, out, limit)
        return [int(out[i]) for i in range(n)]
    from amaranth_twstft_tpu.ops import lfsr

    return lfsr.find_mseq_taps(bit_len, limit)


def prn_chips(bit_len: int, taps: int, n: int, seed: int = 1) -> np.ndarray:
    lib = load()
    if lib:
        out = np.empty(n, dtype=np.uint8)
        lib.twstft_prn_chips(
            bit_len, taps, seed, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(np.int8)
    from amaranth_twstft_tpu.ops import lfsr

    return lfsr.prn_chips(bit_len, taps, n, seed)
