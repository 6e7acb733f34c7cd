"""ctypes binding for the native batched decoder (csrc/sdm_decode.cc).

The C++ library decodes a whole batch of JPEG/PNG files into ONE contiguous
NHWC uint8 array with its own thread pool — replacing per-image cv2 calls,
Python-thread scheduling, and the np.stack collate copy on the training hot
path. The loader (sdm_tpu/data/loader.py) routes batches here automatically
when (a) the library builds (g++ + libjpeg/libpng, both baked into the
image) and (b) a canary JPEG + PNG decode is BIT-IDENTICAL to cv2.imread —
so the reference's loading contract (BGR uint8, img_dataset.py:26-29) is
never silently changed by a differing system codec. Any failure anywhere
falls back to the pure-Python path.

Build artifacts land in csrc/build/ (gitignored); rebuilds happen only when
the source is newer than the .so.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SRC = os.path.join(_CSRC, "sdm_decode.cc")
_SO = os.path.join(_CSRC, "build", "libsdm_decode.so")

_lock = threading.Lock()
_lib = None            # ctypes.CDLL once loaded
_available: Optional[bool] = None   # tri-state: None = not yet probed


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return True
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-ljpeg", "-lpng", "-pthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logging.info(f"native decoder build skipped: {e}")
        return False
    if proc.returncode != 0:
        logging.info(f"native decoder build failed:\n{proc.stderr[-1000:]}")
        return False
    return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_SO)
    lib.sdm_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    lib.sdm_decode_batch.restype = ctypes.c_int
    lib.sdm_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
    lib.sdm_probe.restype = ctypes.c_int
    _lib = lib
    return lib


def probe(path: str):
    """(height, width) of an image file, from its header only."""
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    err = ctypes.create_string_buffer(512)
    if lib.sdm_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                     err, len(err)) != 0:
        raise RuntimeError(err.value.decode(errors="replace"))
    return h.value, w.value


def decode_batch(paths: List[str], h: int, w: int,
                 num_threads: int = 0) -> np.ndarray:
    """Decode `paths` into an (N, h, w, 3) BGR uint8 array (one C call)."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = ctypes.create_string_buffer(512)
    rc = lib.sdm_decode_batch(
        arr, n, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads, err, len(err))
    if rc != 0:
        raise RuntimeError(err.value.decode(errors="replace"))
    return out


def _canary_matches_cv2() -> bool:
    """Decode one synthetic JPEG and one PNG through cv2 AND the native
    library; require bit-identity so a divergent system codec can never
    silently change training pixels."""
    import tempfile
    import cv2

    rng = np.random.default_rng(12345)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        pj = os.path.join(d, "canary.jpg")
        pp = os.path.join(d, "canary.png")
        cv2.imwrite(pj, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        cv2.imwrite(pp, img)
        ours = decode_batch([pj, pp], 24, 32)
        theirs = np.stack([cv2.imread(pj), cv2.imread(pp)])
        return bool(np.array_equal(ours, theirs))


def available() -> bool:
    """True when the native decoder is built, loadable, AND bit-identical
    to cv2 on the canary. Cached; safe from multiple threads."""
    global _available
    if _available is not None:
        return _available
    with _lock:
        if _available is not None:
            return _available
        try:
            ok = _build() and _canary_matches_cv2()
            if not ok and os.path.exists(_SO):
                logging.info("native decoder disabled: canary decode "
                             "differs from cv2")
        except Exception as e:  # any failure -> pure-Python path
            logging.info(f"native decoder disabled: {e}")
            ok = False
        _available = ok
        return ok
