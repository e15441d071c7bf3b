"""ctypes bindings to the native C++ augmentation ops (optional).

native/augment.cpp holds bit-exact C++ ports of the Pillow math in
``augment_pil_exact`` — the --host_augment hot path. This module loads
them from the same shared library as the decode/resize loader
(data/native.py) and exposes menu-level ``apply_family`` /
``apply_family_label`` twins that return EXACTLY what the numpy layer
returns (tests/test_native_augment.py pins it), just faster (~5-20x,
tools/bench_host_aug.py NATIVE rows). ``host_augment.HostAugment``
routes through here when the library is available; a stale .so built
before the augment ops simply lacks the symbols and everything falls
back to numpy.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import native as _native
from . import augment_pil_exact as px

_AUG = None
_AUG_TRIED = False
_FUSED = False

_BLEND_BRIGHTNESS, _BLEND_CONTRAST, _BLEND_SATURATION = 0, 1, 2


def _load():
    global _AUG, _AUG_TRIED
    if _AUG_TRIED:
        return _AUG
    _AUG_TRIED = True
    lib = _native._load()
    if lib is None:
        return None
    try:
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.dseg_aug_blend.restype = ctypes.c_int
        lib.dseg_aug_blend.argtypes = [u8p, u8p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_float]
        lib.dseg_aug_gray3.restype = ctypes.c_int
        lib.dseg_aug_gray3.argtypes = [u8p, u8p, ctypes.c_int,
                                       ctypes.c_int]
        lib.dseg_aug_hue.restype = ctypes.c_int
        lib.dseg_aug_hue.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int]
        lib.dseg_aug_perspective_bilinear.restype = ctypes.c_int
        lib.dseg_aug_perspective_bilinear.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f64p,
            ctypes.c_int]
        lib.dseg_aug_perspective_nearest.restype = ctypes.c_int
        lib.dseg_aug_perspective_nearest.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int, f64p, ctypes.c_int]
        lib.dseg_aug_affine_nearest_fixed.restype = ctypes.c_int
        lib.dseg_aug_affine_nearest_fixed.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _AUG = lib
    except AttributeError:
        # .so predates augment.cpp — rebuild with `make clean all` to
        # pick the native path up; numpy fallback meanwhile
        _AUG = None
        return _AUG
    global _FUSED
    try:
        # round-5 single-pass menu fusions; probed separately so a .so
        # holding only the per-op forms keeps the full native path
        lib.dseg_aug_cs_hf_fused.restype = ctypes.c_int
        lib.dseg_aug_cs_hf_fused.argtypes = [u8p, u8p, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_float,
                                             ctypes.c_float]
        lib.dseg_aug_bright_gray1.restype = ctypes.c_int
        lib.dseg_aug_bright_gray1.argtypes = [u8p, u8p, ctypes.c_int,
                                              ctypes.c_int, ctypes.c_float]
        lib.dseg_aug_rotate_gray_rep3.restype = ctypes.c_int
        lib.dseg_aug_rotate_gray_rep3.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _FUSED = True
    except AttributeError:
        _FUSED = False
    return _AUG


def available() -> bool:
    return _load() is not None


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def _call3(fn, img: np.ndarray, *args) -> np.ndarray:
    src = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = src.shape[:2]
    out = np.empty_like(src)
    if fn(_u8p(src), _u8p(out), h, w, *args) != 0:
        raise RuntimeError("native augment op failed")
    return out


def _blend(img: np.ndarray, mode: int, factor: float) -> np.ndarray:
    lib = _load()
    return _call3(lib.dseg_aug_blend, img, mode,
                  ctypes.c_float(np.float32(factor)))


def _coeffs_arr(coeffs):
    c = np.ascontiguousarray([float(v) for v in coeffs], np.float64)
    return c, c.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def perspective_bilinear(img: np.ndarray, coeffs,
                         fill: int = 0) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(img, dtype=np.uint8)
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    h, w, ch = src.shape
    out = np.empty_like(src)
    _c, cp = _coeffs_arr(coeffs)
    if lib.dseg_aug_perspective_bilinear(_u8p(src), _u8p(out), h, w, ch,
                                         cp, int(fill)) != 0:
        raise RuntimeError("native perspective failed")
    return out[..., 0] if squeeze else out


def perspective_nearest_label(label: np.ndarray, coeffs,
                              fill: int = 255) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(label, dtype=np.uint8)
    h, w = src.shape
    out = np.empty_like(src)
    _c, cp = _coeffs_arr(coeffs)
    if lib.dseg_aug_perspective_nearest(_u8p(src), _u8p(out), h, w, cp,
                                        int(fill)) != 0:
        raise RuntimeError("native nearest warp failed")
    return out


def rotate_nearest(img: np.ndarray, angle: float,
                   fill: int = 0) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(img, dtype=np.uint8)
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    h, w, ch = src.shape
    # the six 16.16 fixed-point starts/steps come from the shared exact
    # Python-int math (identical to Pillow's Python-side matrix build)
    starts = px.rotate_fixed_point_starts(float(angle), w, h)
    out = np.empty_like(src)
    if lib.dseg_aug_affine_nearest_fixed(
            _u8p(src), _u8p(out), h, w, ch,
            *[ctypes.c_int64(int(v)) for v in starts], int(fill)) != 0:
        raise RuntimeError("native rotate failed")
    return out[..., 0] if squeeze else out


def apply_family(img: np.ndarray, aug_type: str, params: dict
                 ) -> Optional[np.ndarray]:
    """Native twin of augment_pil_exact.apply_family — bit-identical
    output, or None when the library isn't available (caller falls back
    to numpy)."""
    if not available():
        return None
    if not params.get("applied", True):
        return np.ascontiguousarray(img, dtype=np.uint8).copy()
    if aug_type == "CS-HF":
        if _FUSED:
            lib = _load()
            return _call3(lib.dseg_aug_cs_hf_fused, img,
                          ctypes.c_float(np.float32(params["contrast"])),
                          ctypes.c_float(np.float32(params["saturation"])))
        out = _blend(img, _BLEND_CONTRAST, params["contrast"])
        out = _blend(out, _BLEND_SATURATION, params["saturation"])
        return out[:, ::-1].copy()
    if aug_type == "H-RP":
        lib = _load()
        out = _call3(lib.dseg_aug_hue, img,
                     px.hue_shift_u8(params["hue"]))
        return perspective_bilinear(out, params["coeffs"], fill=0)
    if aug_type == "B-GS-R":
        lib = _load()
        if _FUSED:
            src = np.ascontiguousarray(img, dtype=np.uint8)
            h, w = src.shape[:2]
            gray = np.empty((h, w), np.uint8)
            if lib.dseg_aug_bright_gray1(
                    _u8p(src), _u8p(gray), h, w,
                    ctypes.c_float(np.float32(params["brightness"]))) != 0:
                raise RuntimeError("native bright+gray op failed")
            # rotate the single gray plane and replicate to 3 channels
            # in the same native pass: nearest rotation is a pixel
            # permutation with fill 0 -> 0, so it commutes with
            # channel replication
            starts = px.rotate_fixed_point_starts(
                float(params["angle"]), w, h)
            out = np.empty((h, w, 3), np.uint8)
            if lib.dseg_aug_rotate_gray_rep3(
                    _u8p(gray), _u8p(out), h, w,
                    *[ctypes.c_int64(int(v)) for v in starts], 0) != 0:
                raise RuntimeError("native rotate+rep3 op failed")
            return out
        out = _blend(img, _BLEND_BRIGHTNESS, params["brightness"])
        out = _call3(lib.dseg_aug_gray3, out)
        return rotate_nearest(out, params["angle"], fill=0)
    raise ValueError(f"unknown aug_type {aug_type!r}")


def apply_family_label(label: np.ndarray, aug_type: str, params: dict,
                       fill: int = 255) -> Optional[np.ndarray]:
    """Native twin of host_augment.apply_family_label (uint8 labels)."""
    if not available() or label.dtype != np.uint8:
        return None
    if not params.get("applied", True):
        return np.ascontiguousarray(label).copy()
    if aug_type == "CS-HF":
        return np.ascontiguousarray(label)[:, ::-1].copy()
    if aug_type == "H-RP":
        return perspective_nearest_label(label, params["coeffs"], fill)
    if aug_type == "B-GS-R":
        return rotate_nearest(label, params["angle"], fill=fill)
    raise ValueError(f"unknown aug_type {aug_type!r}")
