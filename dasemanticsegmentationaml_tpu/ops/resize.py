"""Device-side resize ops with exact PyTorch ``F.interpolate`` semantics.

The reference uses two interpolation flavours on the hot path:

* ``F.interpolate(mode='bilinear', align_corners=True)`` for the three output
  heads (reference model/model_stages.py:240-242) -- parity-critical: the
  mIoU-within-0.5 bar dies here first (SURVEY.md section 7 "hard parts").
* ``F.interpolate(mode='nearest')`` inside the context path
  (reference model/model_stages.py:123,127,132).

``jax.image.resize`` implements half-pixel-center sampling (align_corners
False), so both are built here from first principles with statically
precomputed gather indices + weights. All shapes are static, so everything
stays jittable and XLA lowers the gathers to cheap dynamic-slices/takes.

Layout is NHWC (TPU-native). Interpolation weights are applied in the input
dtype's accumulation type (fp32 for bf16 inputs) and cast back.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _align_corners_taps(in_size: int, out_size: int):
    """Per-output-pixel source taps for align_corners=True linear sampling.

    Source position of output pixel o is ``o * (in-1) / (out-1)`` (torch
    aten upsample_bilinear2d with align_corners=True). Returns int32 index
    arrays (lo, hi) and the fp32 weight of the ``hi`` tap.
    """
    if out_size == 1 or in_size == 1:
        lo = np.zeros((out_size,), np.int32)
        return lo, lo, np.zeros((out_size,), np.float32)
    pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int32)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (pos - lo).astype(np.float32)
    return lo, hi, w_hi


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int):
    """Torch 'nearest' source index: floor(o * in / out)."""
    idx = np.floor(
        np.arange(out_size, dtype=np.float64) * (in_size / out_size)
    ).astype(np.int32)
    return np.minimum(idx, in_size - 1)


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(in, out) fp32 matrix with the two align_corners taps per column.

    Interpolation-as-matmul is the TPU-native form: a gather along a
    spatial axis lowers to a scalar loop on TPU (observed: minutes-long
    compiles at 512x1024), while this rides the MXU.  The product is
    numerically EXACT vs the two-tap formula in fp32: every other term
    of the contraction is 0.0, and adding 0.0 is exact.
    """
    lo, hi, w_hi = _align_corners_taps(in_size, out_size)
    m = np.zeros((in_size, out_size), np.float32)
    cols = np.arange(out_size)
    np.add.at(m, (lo, cols), 1.0 - w_hi)
    np.add.at(m, (hi, cols), w_hi)
    return m


def _interp_axis(x: jax.Array, axis: int, in_size: int, out_size: int) -> jax.Array:
    m = jnp.asarray(_interp_matrix(in_size, out_size))
    if x.dtype in (jnp.bfloat16, jnp.float16):
        # Training/bf16 path: native MXU passes with fp32 accumulation.
        # bf16 x bf16 products are exact in fp32; only the taps round to
        # bf16 (<=2^-9 relative), far below bf16 data precision. HIGHEST
        # here cost 6 passes and dominated the train step (measured
        # ~250 ms per head at 8x512x1024).
        out = jax.lax.dot_general(
            jnp.moveaxis(x, axis, -1), m.astype(x.dtype),
            ((( x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = jnp.moveaxis(out, -1, axis)
        return out.astype(x.dtype)
    # fp32 parity path: exact two-tap arithmetic (see _interp_matrix).
    out = jnp.tensordot(x, m, axes=((axis,), (0,)),
                        precision=jax.lax.Precision.HIGHEST)
    out = jnp.moveaxis(out, -1, axis)
    return out.astype(x.dtype)


def resize_bilinear_align_corners(
    x: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) input, align_corners=True semantics.

    Exact match of ``torch.nn.functional.interpolate(x, (H, W),
    mode='bilinear', align_corners=True)`` up to float associativity.
    """
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out_h, out_w = out_hw
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_h != out_h:
        x = _interp_axis(x, h_axis, in_h, out_h)
    if in_w != out_w:
        x = _interp_axis(x, w_axis, in_w, out_w)
    return x


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC (or HWC) input, torch ``mode='nearest'`` rules."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out_h, out_w = out_hw
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_h != out_h:
        x = jnp.take(x, jnp.asarray(_nearest_indices(in_h, out_h)), axis=h_axis)
    if in_w != out_w:
        x = jnp.take(x, jnp.asarray(_nearest_indices(in_w, out_w)), axis=w_axis)
    return x


def upsample_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest upsample; integer ratios become reshape-broadcasts (XLA-cheap).

    Used for the context-path 2x upsamples and the 1x1 -> H/32 x W/32 global
    context broadcast (reference model/model_stages.py:123,127,132).
    """
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out_h, out_w = out_hw
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_h == 1 and in_w == 1:
        # Pure broadcast (global-context path).
        reps = [1] * x.ndim
        reps[h_axis], reps[w_axis] = out_h, out_w
        return jnp.tile(x, reps)
    if out_h % in_h == 0 and out_w % in_w == 0:
        rh, rw = out_h // in_h, out_w // in_w
        x = jnp.repeat(x, rh, axis=h_axis)
        x = jnp.repeat(x, rw, axis=w_axis)
        return x
    return resize_nearest(x, out_hw)


def bilinear_gather_plan(in_size: int, out_size: int):
    """Expose (lo, hi, w_hi) tap plan -- consumed by the Pallas eval kernel."""
    return _align_corners_taps(in_size, out_size)
