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
   non-tap term of the contraction contributes an exact +0.0. But fp32
   HIGHEST dots cost 6 MXU passes, and Mosaic supports no middle tier
   (Precision.HIGH raises NotImplementedError in its dot lowering).
 * When the logits come from a bf16 model they are bf16-exact, so a
   SPLIT scheme reaches ~16-bit-exact interpolation in 1-pass bf16
   dots: taps decomposed as bf16 hi+lo pairs; stage 1 = mr_hi@x +
   mr_lo@x (x cast bf16, exact); stage 2 per class = r_hi@mc_hi +
   r_lo@mc_hi + r_hi@mc_lo (r split bf16 hi+lo, lo x lo dropped).
   Measured v5e, 64x128x19 -> 512x1024, bs 128 (tools/
   probe_upargmax_precision.py): HIGHEST 102.7 us/img; SPLIT 55.8
   us/img with 4.7e-6 argmax mismatch (sub-16-bit ties only);
   1-pass DEFAULT 33.0 us/img but 2.6e-3 mismatch (8-bit taps).
   Policy: bf16 inputs take SPLIT, fp32 inputs keep the exact
   HIGHEST path (checkpoint-parity evals).

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


def _row_block(out_h: int, max_row_blk: int = MAX_ROW_BLK) -> int:
    """Largest multiple of 8 dividing out_h, capped at max_row_blk (0 if none).

    Bigger blocks amortize per-grid-step overhead and MXU pipeline fill
    (each per-class dot has M=row_blk; at M=64 the ~2x-M fill dominates
    small dots). Measured: 64 beats 8 by ~10% on the HIGHEST kernel; see
    tools/probe_upargmax_precision.py for the SPLIT-kernel block sweep.
    """
    blk = 0
    for cand in range(8, max_row_blk + 1, 8):
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


@functools.lru_cache(maxsize=None)
def _tap_matrix_split(in_size: int, out_size: int, transpose: bool):
    """Tap matrix as a (hi, lo) pair of bf16 arrays with hi+lo ~16-bit
    exact (lo = bf16 residual of the fp32 taps after bf16 rounding)."""
    import ml_dtypes  # ships with jax; keeps this pure numpy (jit-safe)

    m = _tap_matrix(in_size, out_size, transpose)
    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _make_split_kernel(c: int, row_blk: int):
    f32 = jnp.float32

    def _kernel(x_ref, mrh_ref, mrl_ref, mch_ref, mcl_ref, out_ref):
        # x holds bf16-exact values (cast from a bf16 model's logits).
        xb = x_ref[0].astype(jnp.bfloat16)
        rows = (jnp.dot(mrh_ref[:, :], xb, preferred_element_type=f32)
                + jnp.dot(mrl_ref[:, :], xb, preferred_element_type=f32))
        r_hi = rows.astype(jnp.bfloat16)
        r_lo = (rows - r_hi.astype(f32)).astype(jnp.bfloat16)
        w = mch_ref.shape[0]
        out_w = mch_ref.shape[1]
        best = jnp.full((row_blk, out_w), -jnp.inf, f32)
        idx = jnp.zeros((row_blk, out_w), jnp.int32)
        for j in range(c):  # static unroll over classes
            sl = slice(j * w, (j + 1) * w)
            u = (jnp.dot(r_hi[:, sl], mch_ref[:, :],
                         preferred_element_type=f32)
                 + jnp.dot(r_lo[:, sl], mch_ref[:, :],
                           preferred_element_type=f32)
                 + jnp.dot(r_hi[:, sl], mcl_ref[:, :],
                           preferred_element_type=f32))
            idx = jnp.where(u > best, j, idx)
            best = jnp.maximum(u, best)
        out_ref[0] = idx

    return _kernel


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
                 precision=jax.lax.Precision.HIGHEST,
                 split: bool = False,
                 max_row_blk: int = MAX_ROW_BLK,
                 parallel_grid: bool = False) -> jax.Array:
    """logits_t: (B, h, C, w) fp32.

    split=True uses the bf16 hi+lo tap decomposition (see module
    docstring) -- only valid when the fp32 values are bf16-exact.
    """
    from jax.experimental.pallas import tpu as pltpu

    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    row_blk = _row_block(out_h, max_row_blk)
    x2 = logits_t.reshape(b, h, c * w)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    x_spec = spec((1, h, c * w), lambda bi, oi: (bi, 0, 0))
    mr_spec = spec((row_blk, h), lambda bi, oi: (oi, 0))
    mc_spec = spec((w, out_w), lambda bi, oi: (0, 0))
    out_spec = spec((1, row_blk, out_w), lambda bi, oi: (bi, oi, 0))

    if split:
        mrh, mrl = _tap_matrix_split(h, out_h, transpose=True)
        mch, mcl = _tap_matrix_split(w, out_w, transpose=False)
        operands = (x2, jnp.asarray(mrh), jnp.asarray(mrl),
                    jnp.asarray(mch), jnp.asarray(mcl))
        in_specs = [x_spec, mr_spec, mr_spec, mc_spec, mc_spec]
        kernel = _make_split_kernel(c, row_blk)
        n_passes = 3
    else:
        operands = (x2, jnp.asarray(_tap_matrix(h, out_h, transpose=True)),
                    jnp.asarray(_tap_matrix(w, out_w, transpose=False)))
        in_specs = [x_spec, mr_spec, mc_spec]
        kernel = _make_kernel(c, row_blk, precision)
        n_passes = 6 if precision == jax.lax.Precision.HIGHEST else 1

    grid_spec = pl.GridSpec(
        grid=(b, out_h // row_blk),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    # the cost hint is ints-only: drop it when b is a symbolic batch dim
    # (jax.export shape polymorphism, utils/export.py fused artifacts)
    cost = pl.CostEstimate(
        flops=n_passes * 2 * b * out_h * c * w * (h // 8 + out_w),
        bytes_accessed=b * (h * c * w * 4 + out_h * out_w * 4)
        + (out_h * h + w * out_w) * 4,
        transcendentals=0,
    ) if isinstance(b, int) else None
    extra = {}
    if parallel_grid and not interpret:
        # both grid dims are independent; lets Mosaic multi-buffer blocks
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=cost,
        interpret=interpret,
        **extra,
    )(*operands)


VMEM_BUDGET = 12 * 1024 * 1024  # conservative vs the 16 MB scoped limit


def _vmem_estimate(h: int, w: int, c: int, out_h: int, out_w: int,
                   row_blk: int) -> int:
    """Upper-bound bytes of per-grid-step VMEM (blocks + intermediates).

    A compile-side scoped-vmem OOM does not just fail: it wedges this
    stack's remote compile service for hours (observed twice, e.g.
    row_blk=512 at 512x1024x19 -> 19.6 MB > 16 MB). Shapes over budget
    fall back to XLA instead of ever reaching Mosaic.
    """
    x_blk = h * c * w * 4
    taps = (row_blk * h + w * out_w) * 4 * 2       # fp32 or 2x bf16 pairs
    out_blk = row_blk * out_w * 4
    rows = row_blk * c * w * (4 + 2 + 2)           # fp32 + bf16 hi/lo
    running = row_blk * out_w * 4 * 3              # u, best, idx
    return x_blk + taps + out_blk + rows + running


def upsample_argmax(logits: jax.Array, out_hw: Tuple[int, int],
                    force: str = "auto") -> jax.Array:
    """(B, h, w, C) logits -> (B, H, W) int32 argmax of the align_corners
    bilinear upsample. force: 'auto' | 'pallas' | 'split' | 'fast' |
    'xla' | 'interpret'.

    bf16 logits take the SPLIT kernel (1-pass bf16 dots, ~16-bit-exact
    taps, 1.84x faster -- see module docstring); fp32 logits keep the
    exact fp32-HIGHEST kernel (checkpoint-parity evals). 'fast' opts
    into the single-pass DEFAULT kernel (measured 32 vs 56 us/img but
    8-bit taps: ~2.6e-3 of pixels -- boundary near-ties -- flip vs the
    fp32 reference; mIoU impact is well under the 0.5 parity bar).
    """
    if force == "xla":
        return _xla_reference(logits, out_hw)
    on_tpu = jax.default_backend() == "tpu"
    if force == "auto" and not on_tpu:
        return _xla_reference(logits, out_hw)
    row_blk = _row_block(out_hw[0])
    if row_blk == 0:  # Mosaic sublane granule
        return _xla_reference(logits, out_hw)
    b, h, w, c = logits.shape
    if _vmem_estimate(h, w, c, out_hw[0], out_hw[1],
                      row_blk) > VMEM_BUDGET:
        return _xla_reference(logits, out_hw)
    split = force == "split" or (
        force in ("auto", "pallas", "interpret")
        and logits.dtype == jnp.bfloat16)
    interpret = force == "interpret" or (
        force in ("split", "fast") and not on_tpu)
    logits_t = jnp.transpose(logits.astype(jnp.float32), (0, 1, 3, 2))
    if force == "fast":
        return _pallas_call(logits_t, out_hw, interpret=interpret,
                            precision=jax.lax.Precision.DEFAULT)
    return _pallas_call(logits_t, out_hw, interpret=interpret, split=split)
