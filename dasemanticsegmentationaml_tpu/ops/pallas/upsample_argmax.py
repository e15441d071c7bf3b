"""Fused bilinear-upsample(align_corners=True) + class argmax, Pallas TPU.

Eval inference (reference train.py:36-38) is: head logits at stride 8
-> bilinear upsample to input size (model_stages.py:240) -> argmax
(utils.py:120-122). Unfused, XLA materializes the upsampled logits
(e.g. 512 x 1024 x 19 fp32 = 40 MB per image) in HBM -- written once, read
once, purely bandwidth. This kernel streams the low-res logits once from
VMEM and writes only the (H, W) int32 argmax:

  per output row o (grid step):
    R   = (1-t[o]) * X[lo[o]] + t[o] * X[hi[o]]     # (C, w) VPU combine
    U   = R @ M                                      # (C, W) MXU matmul
    out = argmax_C(U)                                # (W,) int32

where M (w, W) is the column-interpolation matrix with two nonzeros per
column (align_corners taps from ops/resize.py). The matmul form trades
"free" MXU FLOPs for zero gather traffic -- the canonical TPU move.

HBM traffic per image: read h*w*C*4 + write H*W*4 (~2.6 MB at 1024x512)
vs ~80 MB unfused: a ~30x reduction on the eval hot path.

The public entry falls back to the XLA path off-TPU (and under
``interpret=True`` for CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..resize import bilinear_gather_plan, resize_bilinear_align_corners


def _xla_reference(logits: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    up = resize_bilinear_align_corners(logits.astype(jnp.float32), out_hw)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _col_matrix(in_w: int, out_w: int) -> np.ndarray:
    lo, hi, t = bilinear_gather_plan(in_w, out_w)
    m = np.zeros((in_w, out_w), np.float32)
    cols = np.arange(out_w)
    np.add.at(m, (lo, cols), 1.0 - t)
    np.add.at(m, (hi, cols), t)
    return m


ROW_BLK = 8  # output rows per grid step (Mosaic sublane granule for int32)


def _kernel(row_lo_ref, row_hi_ref, row_t_ref,  # scalar prefetch (SMEM)
            x_ref, m_ref, out_ref):
    oi = pl.program_id(1)
    for r in range(ROW_BLK):  # static unroll; o is a traced scalar
        o = oi * ROW_BLK + r
        lo = row_lo_ref[o]
        hi = row_hi_ref[o]
        t = row_t_ref[o]
        # x_ref block: (1, h, C, w); take the two source rows -> (C, w)
        r_lo = x_ref[0, lo, :, :].astype(jnp.float32)
        r_hi = x_ref[0, hi, :, :].astype(jnp.float32)
        row = r_lo * (1.0 - t) + r_hi * t
        # precision=highest: exact fp32 taps (the default truncates fp32
        # matmul inputs to bf16 passes, which perturbs near-tie argmaxes);
        # the matmul is ~5 MFLOP/row, irrelevant next to bandwidth.
        up = jnp.dot(row, m_ref[:, :], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        out_ref[0, r, :] = jnp.argmax(up, axis=0).astype(jnp.int32)


def _pallas_call(logits_t: jax.Array, out_hw: Tuple[int, int],
                 interpret: bool = False) -> jax.Array:
    """logits_t: (B, h, C, w) fp32."""
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu

    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    lo, hi, t = bilinear_gather_plan(h, out_h)
    m = jnp.asarray(_col_matrix(w, out_w))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, out_h // ROW_BLK),
        in_specs=[
            pl.BlockSpec((1, h, c, w), lambda bi, oi, *_: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLK, out_w),
                               lambda bi, oi, *_: (bi, oi, 0),
                               memory_space=pltpu.VMEM),
    )

    cost = pl.CostEstimate(
        flops=2 * b * out_h * c * w * out_w,
        bytes_accessed=b * (h * c * w * 4 + out_h * out_w * 4) + w * out_w * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(t), logits_t, m)


# make pl importable at module scope for _kernel
from jax.experimental import pallas as pl  # noqa: E402


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
    if out_hw[0] % ROW_BLK != 0:  # Mosaic sublane granule
        return _xla_reference(logits, out_hw)
    interpret = force == "interpret"
    logits_t = jnp.transpose(logits.astype(jnp.float32), (0, 1, 3, 2))
    return _pallas_call(logits_t, out_hw, interpret=interpret)
