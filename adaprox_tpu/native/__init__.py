"""Native (C++) components, loaded via ctypes.

Currently: the parallel LIBSVM parser (libsvm_parser.cpp). The shared object
is built lazily with g++ on first use and cached next to the source; every
native entry point has a pure-Python fallback so the framework works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "libsvm_parser.cpp")
_SO = os.path.join(_HERE, "_libsvm_parser.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build_so(src, so, extra_flags=()) -> str | None:
    """Compile ``src`` -> ``so`` if stale (atomic tmp+rename). Returns an
    error string or None. Shared by every native component."""
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return None
    # PID-unique tmp: concurrent first-use builds (launch.py --spawn N on a
    # fresh checkout) would otherwise interleave g++ output into ONE shared
    # tmp file and os.replace could install a torn .so
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           *extra_flags, src, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ unavailable: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[:500]}"
    os.replace(tmp, so)
    return None


def _build() -> str | None:
    return _build_so(_SRC, _SO, extra_flags=("-pthread",))


def get_lib():
    """The loaded ctypes library, or None if unavailable (error recorded)."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_SO)
        lib.adaprox_libsvm_parse_coo.restype = ctypes.c_void_p
        lib.adaprox_libsvm_parse_coo.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.adaprox_libsvm_coo_fill_dense.restype = ctypes.c_int
        lib.adaprox_libsvm_coo_fill_dense.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.adaprox_libsvm_coo_free.restype = None
        lib.adaprox_libsvm_coo_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def build_error() -> str | None:
    return _build_error


# --------------------------------------------------------------------------
# JSONL sink (jsonl_sink.cpp) — same lazy-build/ctypes/fallback pattern
# --------------------------------------------------------------------------

_SINK_SRC = os.path.join(_HERE, "jsonl_sink.cpp")
_SINK_SO = os.path.join(_HERE, "_jsonl_sink.so")
_sink_lib = None
_sink_error: str | None = None


def get_sink_lib():
    global _sink_lib, _sink_error
    with _lock:
        if _sink_lib is not None or _sink_error is not None:
            return _sink_lib
        err = _build_so(_SINK_SRC, _SINK_SO)
        if err is not None:
            _sink_error = err
            return None
        lib = ctypes.CDLL(_SINK_SO)
        lib.adaprox_write_jsonl.restype = ctypes.c_int
        lib.adaprox_write_jsonl.argtypes = [
            ctypes.c_char_p,                      # path
            ctypes.c_char_p,                      # mode
            ctypes.c_char_p,                      # method (or None)
            ctypes.POINTER(ctypes.c_char_p),      # keys
            ctypes.c_int,                         # n_keys
            ctypes.POINTER(ctypes.c_double),      # values (n_rows, n_keys)
            ctypes.POINTER(ctypes.c_ubyte),       # is_int per key
            ctypes.c_longlong,                    # n_rows
        ]
        _sink_lib = lib
        return _sink_lib


def write_jsonl_native(path, method, keys, values, is_int, mode="a") -> bool:
    """Write (n_rows, n_keys) float64 ``values`` as JSONL rows via the C++
    sink. Returns False ONLY when no bytes reached the file (native lib
    unavailable, or fopen failed — rc 1), so the caller may safely fall back
    to the Python writer. A mid-write failure (rc 2) may have left a partial
    row set on disk; falling back would duplicate those rows, so it is
    reported as True with a warning instead (the sink formats in memory and
    writes once, so rc 2 is a single failed fwrite/fclose, not a torn row)."""
    lib = get_sink_lib()
    if lib is None:
        return False
    values = np.ascontiguousarray(values, dtype=np.float64)
    is_int_arr = np.asarray(is_int, dtype=np.uint8)
    key_arr = (ctypes.c_char_p * len(keys))(*[k.encode() for k in keys])
    rc = lib.adaprox_write_jsonl(
        os.fspath(path).encode(), mode.encode(),
        method.encode() if method is not None else None,
        key_arr, len(keys),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        is_int_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        values.shape[0],
    )
    if rc == 2:
        import warnings

        warnings.warn(
            f"native JSONL sink: write to {path} failed mid-flush; rows may "
            "be incomplete (not retrying — a re-write would duplicate rows)",
            RuntimeWarning,
        )
        return True
    return rc == 0


def parse_libsvm_dense(path, pad_to: int | None = None):
    """Parse with the native parser (single pass over the file into COO,
    then a scatter into the dense buffer). Returns (X, y, rows, cols) with X
    shaped (rows_padded, cols_padded) float64, or None if the native lib is
    unavailable (caller falls back to the Python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    path_b = os.fspath(path).encode()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    handle = lib.adaprox_libsvm_parse_coo(
        path_b, ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(nnz)
    )
    if not handle:
        return None
    try:
        r, c = rows.value, cols.value
        if pad_to:
            rp = -(-r // pad_to) * pad_to
            cp = -(-c // pad_to) * pad_to
        else:
            rp, cp = r, c
        x = np.zeros((rp, max(cp, 1)), dtype=np.float64)
        y = np.zeros(max(rp, 1), dtype=np.float64)
        rc = lib.adaprox_libsvm_coo_fill_dense(
            handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x.shape[1],
        )
        if rc != 0:
            return None
        return x, y, r, c
    finally:
        lib.adaprox_libsvm_coo_free(handle)
