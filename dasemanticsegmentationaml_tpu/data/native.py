"""ctypes bindings to the native C++ decode/resize library (optional).

The reference gets its input pipeline from PyTorch DataLoader worker
processes doing PIL decode (SURVEY.md section 2.2 row 5). Our native
equivalent (native/loader.cpp) is a libpng/libjpeg-turbo decoder with SIMD
resize running in a C++ thread pool; this module loads it if built and
otherwise reports unavailable so callers fall back to PIL.

Build: ``make -C dasemanticsegmentationaml_tpu/native`` (see the Makefile).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False
_LOCK = threading.Lock()

_SO_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libdsegloader.so")


def _build() -> bool:
    """Best-effort `make` of the shared library (fresh checkouts)."""
    import subprocess

    makedir = os.path.dirname(os.path.abspath(_SO_PATH))
    try:
        proc = subprocess.run(["make", "-C", makedir], timeout=120,
                              capture_output=True)
        return proc.returncode == 0
    except Exception:
        return False


def _load():
    global _LIB, _LIB_TRIED
    with _LOCK:
        if _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        path = os.path.abspath(_SO_PATH)
        if not os.path.exists(path) and not _build():
            return None
        if not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.dseg_decode_resize.restype = ctypes.c_int
            lib.dseg_decode_resize.argtypes = [
                ctypes.c_char_p,   # path
                ctypes.c_int,      # out_w (0 = native size)
                ctypes.c_int,      # out_h
                ctypes.c_int,      # mode: 0 bilinear, 1 nearest
                ctypes.c_int,      # grayscale
                ctypes.POINTER(ctypes.c_ubyte),  # out buffer
                ctypes.POINTER(ctypes.c_int),    # out w
                ctypes.POINTER(ctypes.c_int),    # out h
            ]
            lib.dseg_image_size.restype = ctypes.c_int
            lib.dseg_image_size.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, size_wh: Optional[Tuple[int, int]],
                  interp: str, grayscale: bool = False
                  ) -> Optional[np.ndarray]:
    """Decode+resize via the native library; None if unavailable/unsupported.

    size_wh is PIL-convention (width, height) or None for native size.
    """
    lib = _load()
    if lib is None:
        return None
    if not path.lower().endswith((".png", ".jpg", ".jpeg")):
        return None

    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if size_wh is None:
        if lib.dseg_image_size(path.encode(), ctypes.byref(w),
                               ctypes.byref(h)) != 0:
            return None
        out_w, out_h = w.value, h.value
    else:
        out_w, out_h = int(size_wh[0]), int(size_wh[1])

    channels = 1 if grayscale else 3
    buf = np.empty((out_h, out_w, channels), dtype=np.uint8)
    mode = 1 if interp == "nearest" else 0
    rc = lib.dseg_decode_resize(
        path.encode(), out_w, out_h, mode, int(grayscale),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    if grayscale:
        return buf[..., 0]
    return buf
