"""ctypes bindings for the native frame-IO library (native/frameio.cpp).

The C++ library decodes PNG/JPEG frames, center-square-crops and
bilinear-resizes them into one contiguous uint8 [N, S, S, 3] buffer using a
persistent thread pool — the GIL is released for the whole batch, so decode
scales with host cores (the reference decodes frame-by-frame under the GIL
via cv2, data_loader.py:323-331).

Build: ``make -C native`` (auto-attempted on first use). Falls back cleanly:
:func:`available` is False if the library can't be built/loaded, and
callers (datasets) then use the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libewvit_frameio.so"))

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ewvit_decode_batch.restype = ctypes.c_int
        lib.ewvit_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.ewvit_decode_file.restype = ctypes.c_uint64
        lib.ewvit_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: List[str], out_size: int, crop_frac: float = 1.0,
                 nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+crop+resize N files -> (frames [N,S,S,3] uint8, ok [N] bool).

    ``crop_frac`` keeps the central fraction of the center square before
    resizing — 224/450 reproduces the reference's resize(450)->crop(224)
    geometry (transforms.py:96-97). Failed decodes come back as blank (zero)
    frames with ok=False, matching the reference's blank-frame fallback
    (data_loader.py:326-331).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native frameio library unavailable")
    n = len(paths)
    out = np.zeros((n, out_size, out_size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ewvit_decode_batch(
        arr, n, out_size, crop_frac,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nthreads)
    return out, ok.astype(bool)


def decode_file(path: str) -> Optional[np.ndarray]:
    """Decode one image file -> RGB uint8 [H, W, 3], or None on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native frameio library unavailable")
    hw = lib.ewvit_decode_file(path.encode(), None)
    if hw == 0:
        return None
    h, w = int(hw >> 32), int(hw & 0xFFFFFFFF)
    out = np.empty((h, w, 3), np.uint8)
    lib.ewvit_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
