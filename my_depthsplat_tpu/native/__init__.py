"""Native (C++) data-path: threaded JPEG decode + Pillow-exact Lanczos resize.

The reference's input pipeline burns its CPU budget in dataloader workers on
JPEG decode and LANCZOS resize (reference src/dataset/dataset_re10k.py:221-229,
src/dataset/shims/crop_shim.py:14-27). Here that hot loop is a small C++
library (dataload.cpp) compiled on first use with the system toolchain and
driven through ctypes — no pybind11 dependency. Callers fall back to the PIL
path automatically when the toolchain or libjpeg is unavailable
(``available()`` is False) or when ``MY_DEPTHSPLAT_NATIVE=0``.

The resize replicates Pillow's fixed-point resampler bit-for-bit (see
dataload.cpp), so switching between the native and PIL paths cannot change
training data.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("dataload.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_dir() -> Path:
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return Path(cache) / "my_depthsplat_tpu"


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MY_DEPTHSPLAT_NATIVE", "1") == "0":
            return None
        try:
            import hashlib

            src = _SRC.read_bytes()
            tag = hashlib.sha256(src).hexdigest()[:16]
            out = _build_dir() / f"libdsdataload-{tag}.so"
            if not out.exists():
                out.parent.mkdir(parents=True, exist_ok=True)
                tmp = out.with_suffix(f".tmp{os.getpid()}.so")
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        str(_SRC), "-o", str(tmp), "-ljpeg", "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, out)
            lib = ctypes.CDLL(str(out))
            lib.ds_decode_jpeg_batch.restype = ctypes.c_int
            lib.ds_decode_jpeg_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.ds_jpeg_dims.restype = ctypes.c_int
            lib.ds_jpeg_dims.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.ds_resize_lanczos_batch.restype = ctypes.c_int
            lib.ds_resize_lanczos_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _threads(n: int) -> int:
    return max(1, min(n, os.cpu_count() or 1, 16))


def jpeg_dims(buf: bytes) -> tuple[int, int, int] | None:
    """(h, w, channels) of a JPEG, or None if unavailable/corrupt."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(buf, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.ds_jpeg_dims(
        arr.ctypes.data, arr.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
    )
    if rc != 0:
        return None
    return h.value, w.value, c.value


def decode_jpeg_batch(buffers: list[bytes], h: int, w: int) -> np.ndarray | None:
    """Decode same-sized RGB JPEGs to (n, h, w, 3) u8 with a thread pool.
    Returns None when the native library is unavailable or any image fails
    (caller falls back to PIL for error reporting)."""
    lib = _load()
    if lib is None or not buffers:
        return None
    blob = np.frombuffer(b"".join(buffers), np.uint8)
    offsets = np.zeros(len(buffers) + 1, np.int64)
    np.cumsum([len(b) for b in buffers], out=offsets[1:])
    out = np.empty((len(buffers), h, w, 3), np.uint8)
    rc = lib.ds_decode_jpeg_batch(
        blob.ctypes.data, offsets.ctypes.data, len(buffers),
        out.ctypes.data, h, w, _threads(len(buffers)),
    )
    return None if rc != 0 else out


def resize_lanczos_batch(images: np.ndarray, oh: int, ow: int) -> np.ndarray | None:
    """(n, h, w, 3) u8 -> (n, oh, ow, 3) u8, bit-identical to PIL LANCZOS.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3, images.shape
    out = np.empty((n, oh, ow, 3), np.uint8)
    lib.ds_resize_lanczos_batch(
        images.ctypes.data, n, h, w, out.ctypes.data, oh, ow, _threads(n)
    )
    return out
