"""Fused bilinear-upsample(align_corners=True) + class argmax, Pallas TPU.

Eval inference (reference train.py:36-38) is: head logits at stride 8
-> bilinear upsample to input size (model_stages.py:240) -> argmax
(utils.py:120-122). Unfused, XLA materializes the upsampled logits
(e.g. 512 x 1024 x 19 fp32 = 40 MB per image) in HBM -- written once, read
once, purely bandwidth. This kernel streams the low-res logits once into
VMEM and writes only the (H, W) int32 argmax.

Both interpolation axes are expressed as MATMULS against sparse tap
matrices (two nonzeros per row/column -- the align_corners taps from
ops/resize.py), with fully static indexing:

  per grid step (image, row_blk-row block):
    R    = Mr[o:o+row_blk, :] @ X       # (row_blk, h) @ (h, C*w)  row interp
    U_j  = R[:, j*w:(j+1)*w] @ Mc       # per class j: (row_blk, W) col interp
    out  = running argmax over the C column dots (compare/select on the VPU)

Design notes from measured iterations on v5e:
 * dynamic sublane slices for the two source rows dominated runtime
   (~6.5 us/step for ~0.2 us of matmul) -> row interp became a matmul;
 * a reshape-based argmax ((row_blk*C, W) -> (row_blk, C, W)) forced
   sublane relayouts costlier than the matmuls -> the per-class column
   dot keeps everything lane-aligned (class j is the static lane slice
   [j*w, (j+1)*w) of R) with a running compare/select;
 * precision=HIGHEST keeps the result EXACT: fp32 taps, and every
   non-tap term of the contraction contributes an exact +0.0.

HBM traffic per image: read h*w*C*4 + write H*W*4 (~2.6 MB at 1024x512)
vs ~80 MB unfused.

The public entry falls back to the XLA path off-TPU (and under
``interpret=True`` for CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from ..resize import bilinear_gather_plan, resize_bilinear_align_corners

MAX_ROW_BLK = 64  # output rows per grid step (multiple of the 8-sublane granule)


def _row_block(out_h: int) -> int:
    """Largest multiple of 8 dividing out_h, capped at MAX_ROW_BLK (0 if none).

    Bigger blocks amortize per-grid-step overhead (measured: 64 beats 8 by
    ~10%); 8 is the Mosaic int32 sublane granule floor.
    """
    blk = 0
    for cand in range(8, MAX_ROW_BLK + 1, 8):
        if out_h % cand == 0:
            blk = cand
    return blk


def _xla_reference(logits: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    up = resize_bilinear_align_corners(logits.astype(jnp.float32), out_hw)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _tap_matrix(in_size: int, out_size: int, transpose: bool) -> np.ndarray:
    """(in, out) tap matrix (or its transpose) for align_corners interp."""
    lo, hi, t = bilinear_gather_plan(in_size, out_size)
    m = np.zeros((in_size, out_size), np.float32)
    cols = np.arange(out_size)
    np.add.at(m, (lo, cols), 1.0 - t)
    np.add.at(m, (hi, cols), t)
    return np.ascontiguousarray(m.T) if transpose else m


def _make_kernel(c: int, row_blk: int, precision):
    def _kernel(x_ref, mr_ref, mc_ref, out_ref):
        # x_ref: (1, h, c*w); mr_ref: (row_blk, h); mc_ref: (w, W).
        # One row-interp dot for all classes, then a per-class column dot
        # with a running argmax. Class j lives in lanes [j*w, (j+1)*w) of
        # `rows` -- a lane-aligned STATIC slice (w == 128). The earlier
        # reshape-based argmax forced sublane relayouts that cost more
        # than the matmuls; this form has none.
        rows = jnp.dot(mr_ref[:, :], x_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=precision)           # (row_blk, c*w)
        w = mc_ref.shape[0]
        out_w = mc_ref.shape[1]
        best = jnp.full((row_blk, out_w), -jnp.inf, jnp.float32)
        idx = jnp.zeros((row_blk, out_w), jnp.int32)
        for j in range(c):  # static unroll over classes
            u = jnp.dot(rows[:, j * w:(j + 1) * w], mc_ref[:, :],
                        preferred_element_type=jnp.float32,
                        precision=precision)          # (row_blk, W)
            idx = jnp.where(u > best, j, idx)
            best = jnp.maximum(u, best)
        out_ref[0] = idx

    return _kernel


def _pallas_call(logits_t: jax.Array, out_hw: Tuple[int, int],
                 interpret: bool = False,
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """logits_t: (B, h, C, w) fp32."""
    from jax.experimental.pallas import tpu as pltpu

    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    mr = jnp.asarray(_tap_matrix(h, out_h, transpose=True))   # (out_h, h)
    mc = jnp.asarray(_tap_matrix(w, out_w, transpose=False))  # (w, out_w)
    row_blk = _row_block(out_h)
    x2 = logits_t.reshape(b, h, c * w)

    grid_spec = pl.GridSpec(
        grid=(b, out_h // row_blk),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda bi, oi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_blk, h), lambda bi, oi: (oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_blk, out_w),
                               lambda bi, oi: (bi, oi, 0),
                               memory_space=pltpu.VMEM),
    )

    cost = pl.CostEstimate(
        flops=2 * b * out_h * c * w * (h // 8 + out_w),
        bytes_accessed=b * (h * c * w * 4 + out_h * out_w * 4)
        + (out_h * h + w * out_w) * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        _make_kernel(c, row_blk, precision),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(x2, mr, mc)


def upsample_argmax(logits: jax.Array, out_hw: Tuple[int, int],
                    force: str = "auto") -> jax.Array:
    """(B, h, w, C) logits -> (B, H, W) int32 argmax of the align_corners
    bilinear upsample. force: 'auto' | 'pallas' | 'xla' | 'interpret'.
    """
    if force == "xla":
        return _xla_reference(logits, out_hw)
    on_tpu = jax.default_backend() == "tpu"
    if force == "auto" and not on_tpu:
        return _xla_reference(logits, out_hw)
    if _row_block(out_hw[0]) == 0:  # Mosaic sublane granule
        return _xla_reference(logits, out_hw)
    interpret = force == "interpret"
    logits_t = jnp.transpose(logits.astype(jnp.float32), (0, 1, 3, 2))
    return _pallas_call(logits_t, out_hw, interpret=interpret)
