"""ctypes binding for the native C++ token packer (packer.cc).

Builds the shared library on first use with g++ (cached next to the source);
pure-Python fallbacks live in the callers.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "packer.cc"
_SO = _HERE / "_packer.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_unavailable = False


def _build() -> None:
    # temp-then-rename: concurrent processes must never dlopen a
    # half-written .so (see native_jpeg._build)
    tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(tmp),
    ]
    logger.info("Building native packer: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        tmp.unlink(missing_ok=True)


def _load() -> ctypes.CDLL:
    global _lib, _unavailable
    with _lock:
        if _lib is not None:
            return _lib
        if _unavailable:
            raise RuntimeError("native packer unavailable (build failed)")
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
        except Exception as e:
            # cache the failure: callers retry per epoch/batch and would
            # otherwise re-run the failing g++ each time
            _unavailable = True
            stderr = getattr(e, "stderr", b"")
            detail = stderr.decode(errors="replace")[-400:] if stderr else ""
            logger.warning(f"native packer build failed: {e} {detail}")
            raise
        lib = ctypes.CDLL(str(_SO))
        lib.pack_greedy.restype = ctypes.c_int64
        lib.pack_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.shuffle_indices.restype = None
        lib.shuffle_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        _lib = lib
        return lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def pack_greedy(
    token_lists: Sequence[Sequence[int]],
    sep: Sequence[int],
    max_seqlen: int,
) -> np.ndarray:
    """Pack documents into (n_rows, max_seqlen) int32 rows (v2 semantics)."""
    lib = _load()
    lengths = np.fromiter(
        (len(t) for t in token_lists), np.int64, len(token_lists)
    )
    offsets = np.zeros(len(token_lists) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.empty(int(offsets[-1]), np.int32)
    for i, t in enumerate(token_lists):
        flat[offsets[i] : offsets[i + 1]] = np.asarray(t, np.int32)
    sep_arr = np.asarray(list(sep), np.int32)
    total = int(offsets[-1]) + len(token_lists) * max(len(sep_arr), 1)
    max_rows = max(total // max_seqlen + 1, 1)
    out = np.empty((max_rows, max_seqlen), np.int32)
    n_rows = lib.pack_greedy(
        _i32p(flat),
        _i64p(offsets),
        len(token_lists),
        _i32p(sep_arr),
        len(sep_arr),
        max_seqlen,
        _i32p(out),
        max_rows,
    )
    return out[:n_rows].copy()


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    lib = _load()
    idx = np.arange(n, dtype=np.int64)
    lib.shuffle_indices(_i64p(idx), n, seed)
    return idx
