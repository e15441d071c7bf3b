"""Fused bilinear-upsample(align_corners=True) + cross-entropy, Pallas TPU.

The supervised loss (reference train.py:86-89) is CE(ignore=255) on each
head AFTER bilinear upsampling to input size (model_stages.py:240-242).
In XLA, each head's upsampled logits materialize in HBM — at batch 32 /
1024x512 that is ~1.3 GB fp32 per head, written and read again, forward
AND backward. This kernel streams the LOW-res logits (a few MB) and
labels, upsamples row-blocks in VMEM via the tap-matrix matmuls (exact
align_corners arithmetic, ops/resize.py), and emits only per-block loss
sums and valid-pixel counts; the custom-VJP backward kernel recomputes
the block and emits low-res logit gradients directly:

  fwd per (image, row-block):
    rows = Mr[blk] @ F                      # (R, h) @ (h, C*w) row interp
    u_j  = rows[:, j*w:(j+1)*w] @ Mc        # per class: (R, W) col interp
    lse  = m + log sum_j exp(u_j - m)       # two passes over the held u_j
    pick = sum_j where(labels == j, u_j)
    out  = [sum valid*(lse - pick), sum valid]

  bwd per (image, row-block), accumulating into the output block (its
  index map ignores the row-block grid axis, so Mosaic keeps it resident
  in VMEM across the image's sequential row-block iterations):
    P_j = (softmax_j - onehot_j) * valid * g/N
    dF += Mr[blk]^T @ concat_j(P_j @ Mc^T)
  The grid formulation keeps the compiled program one row-block long
  (the earlier fully-unrolled in-kernel loop over nb row-blocks x 19
  class dots compiled ~5 min through the remote tunnel; this is ~nb x
  smaller with bit-identical accumulation order).

Traffic per image per head: read h*w*C*2 + H*W*4 (labels) + write h*w*C*4
— ~2.6 MB vs ~2.6 GB unfused fwd+bwd: a ~1000x cut, far above the ~6x
pallas-vs-XLA streaming handicap on this stack (see fused_stdc.py).

Numerics match the XLA path's class: bf16 matmul inputs with fp32
accumulation (the XLA path also resizes in bf16), fp32 softmax/log.
Used by the supervised trainer only — the DA step must materialize the
upsampled main head anyway because the discriminator consumes it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import resize_bilinear_align_corners
from .upsample_argmax import _tap_matrix, _row_block


def _xla_reference(logits: jax.Array, labels: jax.Array,
                   out_hw: Tuple[int, int],
                   ignore_index: int = 255) -> jax.Array:
    from ..losses import cross_entropy_ignore

    up = resize_bilinear_align_corners(logits, out_hw)
    return cross_entropy_ignore(up, labels, ignore_index)


# ------------------------------------------------------------- forward

def _fwd_kernel(x_ref, lab_ref, mr_ref, mc_ref, out_ref, *,
                c: int, ignore: int):
    rows = jnp.dot(mr_ref[:, :].astype(jnp.bfloat16), x_ref[0],
                   preferred_element_type=jnp.float32)     # (R, c*w)
    rows = rows.astype(jnp.bfloat16)
    w = mc_ref.shape[0]
    mcb = mc_ref[:, :].astype(jnp.bfloat16)
    lab = lab_ref[0]                                        # (R, W) int32
    valid = (lab >= 0) & (lab < c) & (lab != ignore)

    us = []
    m = None
    for j in range(c):
        u = jnp.dot(rows[:, j * w:(j + 1) * w], mcb,
                    preferred_element_type=jnp.float32)     # (R, W)
        us.append(u)
        m = u if m is None else jnp.maximum(m, u)
    s = None
    pick = None
    for j in range(c):
        e = jnp.exp(us[j] - m)
        s = e if s is None else s + e
        p = jnp.where(lab == j, us[j], 0.0)
        pick = p if pick is None else pick + p
    lse = m + jnp.log(s)
    loss = jnp.where(valid, lse - pick, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    z = jnp.where((row == 0) & (col == 0), jnp.sum(loss), 0.0)
    z = jnp.where((row == 1) & (col == 0),
                  jnp.sum(valid.astype(jnp.float32)), z)
    out_ref[0, 0] = z


def _fwd_call(logits_t: jax.Array, labels: jax.Array,
              out_hw: Tuple[int, int], ignore: int,
              interpret: bool = False):
    """logits_t: (B, h, C, w) bf16; labels (B, H, W) int32.

    Returns (loss_sums, valid_counts) per (image, row-block)."""
    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    r = _row_block(out_h)
    mr = jnp.asarray(_tap_matrix(h, out_h, transpose=True))
    mc = jnp.asarray(_tap_matrix(w, out_w, transpose=False))
    x2 = logits_t.reshape(b, h, c * w)
    nb = out_h // r

    grid_spec = pl.GridSpec(
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda bi, oi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, out_w), lambda bi, oi: (bi, oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, h), lambda bi, oi: (oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, oi: (bi, oi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ignore=ignore),
        out_shape=jax.ShapeDtypeStruct((b, nb, 8, 128), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * out_h * c * w * (h // 8 + out_w),
            bytes_accessed=b * (h * c * w * 2 + out_h * out_w * 4),
            transcendentals=b * out_h * out_w * c,
        ),
        interpret=interpret,
    )(x2, labels, mr, mc)
    return out[:, :, 0, 0], out[:, :, 1, 0]


# ------------------------------------------------------------ backward

def _bwd_kernel(x_ref, lab_ref, mr_ref, mc_ref, mct_ref, g_ref,
                dx_ref, *, c: int, ignore: int):
    w = mct_ref.shape[1]
    mcb = mc_ref[:, :].astype(jnp.bfloat16)
    mctb = mct_ref[:, :].astype(jnp.bfloat16)
    gscale = g_ref[pl.program_id(0), 0]
    mr_blk = mr_ref[:, :].astype(jnp.bfloat16)              # (r, h)
    rows = jnp.dot(mr_blk, x_ref[0],
                   preferred_element_type=jnp.float32)
    rows = rows.astype(jnp.bfloat16)
    lab = lab_ref[0]                                        # (r, W)
    valid = (lab >= 0) & (lab < c) & (lab != ignore)
    us = []
    m = None
    for j in range(c):
        u = jnp.dot(rows[:, j * w:(j + 1) * w], mcb,
                    preferred_element_type=jnp.float32)
        us.append(u)
        m = u if m is None else jnp.maximum(m, u)
    s = None
    for j in range(c):
        e = jnp.exp(us[j] - m)
        s = e if s is None else s + e
    gv = jnp.where(valid, gscale, 0.0)
    scale = gv / s
    ts = []
    for j in range(c):
        p = jnp.exp(us[j] - m) * scale - jnp.where(lab == j, 1.0, 0.0) * gv
        ts.append(jnp.dot(p.astype(jnp.bfloat16), mctb,
                          preferred_element_type=jnp.float32))
    t = jnp.concatenate(ts, axis=1)                         # (r, c*w)
    contrib = jnp.dot(mr_blk.transpose(), t.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dx_ref[0] = contrib

    @pl.when(pl.program_id(1) != 0)
    def _accumulate():
        dx_ref[0] += contrib


def _bwd_call(logits_t: jax.Array, labels: jax.Array,
              out_hw: Tuple[int, int], ignore: int, gscale: jax.Array,
              interpret: bool = False):
    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    r = _row_block(out_h)
    nb = out_h // r
    mr = jnp.asarray(_tap_matrix(h, out_h, transpose=True))
    mc = jnp.asarray(_tap_matrix(w, out_w, transpose=False))
    # transpose=True IS ascontiguousarray(m.T) (upsample_argmax.py:93) —
    # reuse its lru_cache instead of re-deriving the transpose here
    mct = jnp.asarray(_tap_matrix(w, out_w, transpose=True))
    x2 = logits_t.reshape(b, h, c * w)
    gs = jnp.broadcast_to(gscale.reshape(b, 1), (b, 1)).astype(jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda bi, oi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, out_w), lambda bi, oi: (bi, oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, h), lambda bi, oi: (oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_w, w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(gs.shape, lambda bi, oi: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c * w), lambda bi, oi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, ignore=ignore),
        out_shape=jax.ShapeDtypeStruct((b, h, c * w), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * out_h * c * w * (h // 8 + out_w),
            bytes_accessed=b * (h * c * w * 6 + out_h * out_w * 4),
            transcendentals=2 * b * out_h * out_w * c,
        ),
        interpret=interpret,
    )(x2, labels, mr, mc, mct, gs)
    return dx.reshape(b, h, c, w)


# ---------------------------------------------------------- public api

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_ce(logits_t, labels, out_hw, ignore, interpret=False):
    sums, counts = _fwd_call(logits_t, labels, out_hw, ignore, interpret)
    n = jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.sum(sums) / n


def _fused_ce_fwd(logits_t, labels, out_hw, ignore, interpret):
    sums, counts = _fwd_call(logits_t, labels, out_hw, ignore, interpret)
    n = jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.sum(sums) / n, (logits_t, labels, n)


def _fused_ce_bwd(out_hw, ignore, interpret, res, g):
    logits_t, labels, n = res
    b = logits_t.shape[0]
    gscale = jnp.broadcast_to(g / n, (b,))
    dx = _bwd_call(logits_t, labels, out_hw, ignore, gscale, interpret)
    return dx.astype(logits_t.dtype), None


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


VMEM_BUDGET = 12 * 1024 * 1024  # conservative vs the 16 MB scoped limit


def _vmem_estimate(h: int, w: int, c: int, out_h: int, out_w: int,
                   r: int) -> int:
    """Upper-bound bytes of per-grid-step VMEM for the BACKWARD kernel
    (a superset of the forward's working set): blocks + intermediates.

    Same rationale as upsample_argmax._vmem_estimate -- a compile-side
    scoped-vmem OOM wedges this stack's remote compile service for hours,
    so over-budget shapes must fall back to XLA before reaching Mosaic.
    """
    x_blk = h * c * w * 2                    # bf16 logits block
    labels = r * out_w * 4
    taps = (r * h + 2 * w * out_w) * 4       # mr + mc + mct
    dx_blk = h * c * w * 4                   # resident output block
    rows = r * c * w * 6                     # fp32 dot result + bf16 copy
    us = c * r * out_w * 4                   # per-class upsampled logits
    ts = c * r * w * 4 + r * c * w * 6       # bwd partial dots + concat t
    contrib = h * c * w * 4
    misc = 6 * r * out_w * 4                 # m/s/valid/scale/...
    return (x_blk + labels + taps + dx_blk + rows + us + ts + contrib
            + misc)


def supported(logits_shape, out_hw, interpret: bool = False) -> bool:
    _, h, w, c = logits_shape
    out_h, out_w = out_hw
    r = _row_block(out_h)
    if interpret:
        # interpret mode never reaches Mosaic: no lane tiling (out_w%128,
        # w%8, c<=32) and no scoped VMEM to protect. Only r==0 (no valid
        # row-block partition) crashes the kernel BODY; the CPU interpret
        # parity tests run tiny non-tiled shapes through here.
        return r > 0
    return (r > 0 and out_w % 128 == 0
            and w % 8 == 0 and c <= 32
            and _vmem_estimate(h, w, c, out_h, out_w, r) <= VMEM_BUDGET)


def cross_entropy_upsampled(logits: jax.Array, labels: jax.Array,
                            out_hw: Tuple[int, int],
                            ignore_index: int = 255,
                            force: str = "auto") -> jax.Array:
    """Mean CE(ignore) of the align_corners-upsampled logits.

    logits: (B, h, w, C) low-res head output; labels: (B, H, W) ints.
    Equals cross_entropy_ignore(resize(logits, out_hw), labels) without
    materializing the upsampled logits. Falls back to the XLA path
    off-TPU or for unsupported shapes. force: 'auto' | 'pallas' | 'xla'
    | 'interpret' (run the Pallas kernels in interpret mode, any backend
    — used by the CPU tests to exercise the real kernel bodies).
    """
    if force in ("pallas", "interpret"):
        # forcing must NOT bypass the shape/VMEM guard: row_block()==0
        # shapes crash, and an over-budget Mosaic compile wedges the
        # remote compile service for hours (CLAUDE.md) — fail loudly.
        # interpret mode only needs the body-correctness subset.
        if not supported(logits.shape, out_hw,
                         interpret=force == "interpret"):
            raise ValueError(
                f"cross_entropy_upsampled(force={force!r}): shape "
                f"{logits.shape} -> {out_hw} fails the supported() "
                f"row-block/VMEM guard; use force='xla'")
    elif (force == "xla"
          or jax.default_backend() != "tpu"
          or logits.dtype == jnp.float32
          or not supported(logits.shape, out_hw)):
        # fp32 logits take the exact XLA path: the kernel computes in
        # bf16 taps, which would silently spend the fp32 parity
        # configuration's precision (--dtype float32 trainers)
        return _xla_reference(logits, labels, out_hw, ignore_index)
    logits_t = jnp.transpose(logits.astype(jnp.bfloat16), (0, 1, 3, 2))
    return _fused_ce(logits_t, labels.astype(jnp.int32), tuple(out_hw),
                     int(ignore_index), force == "interpret")
