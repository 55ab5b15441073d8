"""ctypes binding for the native JPEG decoder (jpeg_decode.cc, libjpeg).

Builds the shared library on first use with g++ (cached next to the
source).  ``decode(path_or_bytes, target_min_side)`` returns an RGB uint8
HWC array decoded with DCT-domain scaling — the smallest 1/8..8/8 scale
whose short side still covers ``target_min_side`` — so a 2000px photo
augmented to 224px never materializes at full resolution.  Callers fall
back to PIL when libjpeg or g++ are unavailable (datasets_image._load_image).
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess
import threading
from typing import Optional, Union

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "jpeg_decode.cc"
_SO = _HERE / "_jpeg_decode.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_unavailable = False


def _build() -> None:
    # build to a per-process temp name, then atomically rename: a second
    # process (multi-host grids launch several trainers per box) must never
    # dlopen a half-written .so — that disables the decoder for its run
    tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-ljpeg", "-o", str(tmp),
    ]
    logger.info("Building native jpeg decoder: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        tmp.unlink(missing_ok=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception as e:
            stderr = getattr(e, "stderr", b"")
            detail = stderr.decode(errors="replace")[-400:] if stderr else ""
            logger.warning(f"native jpeg decoder unavailable: {e} {detail}")
            _unavailable = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_scaled_dims.restype = ctypes.c_int
        lib.jpeg_scaled_dims.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, ip, ip]
        lib.jpeg_decode_rgb.restype = ctypes.c_int
        lib.jpeg_decode_rgb.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, u8p, ctypes.c_int64, ip, ip,
        ]
        lib.jpeg_rejected_decodes.restype = ctypes.c_int64
        lib.jpeg_rejected_decodes.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rejected_decodes() -> int:
    """Decodes the native path rejected for data-corruption warnings
    (each forced a PIL fallback) — fallback-rate visibility for pipelines."""
    lib = _load()
    return int(lib.jpeg_rejected_decodes()) if lib is not None else 0


def decode(
    src: Union[str, pathlib.Path, bytes], target_min_side: int = 0
) -> Optional[np.ndarray]:
    """Decode a JPEG to RGB uint8 (H, W, 3) at DCT-scaled resolution.
    Returns None if the native decoder is unavailable or the file is not a
    decodable JPEG (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    data = (
        src if isinstance(src, bytes) else pathlib.Path(src).read_bytes()
    )
    buf = np.frombuffer(data, np.uint8)
    dptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.jpeg_scaled_dims(
        dptr, len(data), target_min_side, ctypes.byref(w), ctypes.byref(h)
    ) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(
        dptr,
        len(data),
        target_min_side,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return out
