"""ctypes bindings for the native C++ preprocessing library
(transformer_stm_tpu/native/preprocess.cpp).

Builds on demand with g++ (cached next to the source); falls back cleanly
when a compiler or libjpeg is unavailable — the cv2 host path
(data/images.py) stays the default, with the native path as the
high-throughput batch loader:

    from transformer_stm_tpu.data.native import decode_batch
    gray = decode_batch(paths, 128, 128)   # (N, 128, 128) uint8
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "preprocess.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native",
                    "libtstm_preprocess.so")

_lib: Optional[ctypes.CDLL] = None


def _src_hash(src: str) -> str:
    import hashlib
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def build(force: bool = False) -> str:
    """Compile the shared library from source (idempotent).

    The .so is never committed; a fresh checkout always builds from the
    reviewed preprocess.cpp.  Rebuild freshness is keyed on a content hash
    of the source (recorded in a .stamp sidecar at build time), not on
    mtimes — mtimes are unreliable after clone/checkout."""
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    stamp = lib + ".stamp"
    h = _src_hash(src)
    if not force and os.path.exists(lib) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == h:
                return lib
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
           "-fPIC", src, "-o", lib, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(stamp, "w") as f:
        f.write(h)
    return lib


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.tstm_resize_gray.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.tstm_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.tstm_decode_batch.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def resize_gray(bgr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, 3) uint8 BGR -> (out_h, out_w) uint8 gray, bit-exact with
    cv2.resize(INTER_LINEAR) + cv2.cvtColor(BGR2GRAY)."""
    lib = _load()
    bgr = np.ascontiguousarray(bgr, np.uint8)
    out = np.empty((out_h, out_w), np.uint8)
    lib.tstm_resize_gray(
        bgr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bgr.shape[0], bgr.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w)
    return out


def decode_batch(paths: Sequence[str], out_h: int, out_w: int,
                 threads: int = 0) -> np.ndarray:
    """Decode+resize+gray a batch of JPEGs in native threads.
    Returns (N, out_h, out_w) uint8.  Failed files raise."""
    lib = _load()
    n = len(paths)
    out = np.zeros((n, out_h, out_w), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.tstm_decode_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if ok != n:
        raise IOError(f"native decode: {n - ok}/{n} files failed")
    return out


if __name__ == "__main__":
    import sys
    print(build(force="--force" in sys.argv))
