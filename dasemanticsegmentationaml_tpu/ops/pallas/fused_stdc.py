"""Fused STDC CatBottleneck inference kernels (Pallas TPU).

The STDC backbone is HBM-bandwidth-bound on TPU: every ConvX in a
CatBottleneck (reference stdcnet.py:66-113) round-trips its activation
through HBM, and measured per-op bandwidth is ~350-400 GB/s against a
~900 GB/s elementwise ceiling. These kernels compute an ENTIRE bottleneck
per grid step -- 1x1 entry conv, (stride 2 only) fused depthwise 'avd'
conv + its BN and the 3x3/s2 average-pool skip, the three chained 3x3
ConvX's, and the channel concat -- with every intermediate living in VMEM.

Layout: activations are flat (rows * (W+2), C) matrices -- rows and a
zero-padded width ride the sublane dim together, channels ride lanes.
With the width pre-padded, a 3x3 conv is 9 statically-shifted MXU matmuls
whose operands are plain (possibly sublane-unaligned) slices -- Mosaic
supports those for bf16, unlike 16-bit rotates -- and the only
bookkeeping is re-zeroing the two pad columns and any out-of-image halo
rows after each stage (the torch chain zero-pads every intermediate).

Halo rows come from passing the row-padded input with THREE BlockSpecs at
block indices (oi, oi+1, oi+2): the outer (non-tiled) dim is sliced and
concatenated in-kernel at zero relayout cost, and Pallas pipelines the
fetches.

The stride-2 front avoids all strided access via an XLA space-to-depth:
the kernel sees (B, H/2, (W/2)+2pad, 4C) where the four lane groups are
the (row, col) parity quadrants, so the s2 depthwise conv and the s2
average pool become per-quadrant row slices with +-1 flat offsets.

BatchNorm is folded into conv weights/biases beforehand (ops/norm.py
fold_bn_into_conv); matmuls take bf16 inputs with fp32 accumulation,
bias+ReLU in fp32, activations carried bf16.

Inference only (uses running BN stats; no VJP). The training path and
non-TPU backends keep the flax/XLA implementation; `fused == flax` is
asserted by tests to bf16 tolerance.

STATUS: EXPERIMENTAL, not wired into the default inference path.
Measured on v5e (batch 64, all six backbone bottlenecks): correctness
holds (mean rel err ~0.5% bf16), but the kernels run at 0.6-0.8x the
XLA-op chain. Root cause, established with a pure pallas copy kernel:
on this stack a pallas_call's HBM<->VMEM streaming tops out at ~150-170
GB/s regardless of block shape, grid granularity, or
dimension_semantics, while XLA ops sustain 350-917 GB/s. A fusion that
cuts traffic ~2.4x cannot overcome a ~4x I/O handicap. (The fused
upsample+argmax eval kernel DOES win because it cuts traffic ~30x.)
Revisit if the pallas DMA pipeline reaches HBM speed; the kernels and
their layout tricks are correct and tested.

Reference semantics mirrored: stdcnet.py:66-113 (CatBottleneck forward:
concat([skip_or_x1, x2, x3, x4])), :72-79 (avd_layer = dw 3x3 s2 + BN,
skip = AvgPool2d(3, 2, 1)), block_num=4 channel split out/2, out/4,
out/8, out/8 (stdcnet.py:81-92).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..norm import fold_bn_into_conv

VMEM_BUDGET = 10 * 1024 * 1024  # soft cap steering the row-block choice


# --------------------------------------------------------------- folding

@dataclass(frozen=True)
class FoldedCat:
    """BN-folded CatBottleneck weights (bf16 kernels, fp32 biases)."""
    w1: Any          # (Cin, h1)    1x1 entry
    b1: Any          # (1, h1)
    k2: Any          # (3, 3, h1, h2)
    b2: Any
    k3: Any          # (3, 3, h2, h3)
    b3: Any
    k4: Any          # (3, 3, h3, h4)
    b4: Any
    avd_k: Any = None   # (3, 3, h1) depthwise, stride-2 blocks only
    avd_b: Any = None   # (1, h1)
    stride: int = 1


def _fold_convx(p, s, dtype):
    """ConvX params+stats -> (bf16 kernel HWIO, fp32 (1, Cout) bias)."""
    k, b = fold_bn_into_conv(
        p["conv"]["kernel"].astype(jnp.float32), None,
        p["bn"]["scale"], p["bn"]["bias"], s["bn"]["mean"], s["bn"]["var"])
    return k.astype(dtype), b.reshape(1, -1).astype(jnp.float32)


def fold_cat_params(params, stats, stride: int,
                    dtype=jnp.bfloat16) -> FoldedCat:
    """Fold one CatBottleneck's variables subtree (conv_list_0..3 [+avd])."""
    k1, b1 = _fold_convx(params["conv_list_0"], stats["conv_list_0"], dtype)
    k2, b2 = _fold_convx(params["conv_list_1"], stats["conv_list_1"], dtype)
    k3, b3 = _fold_convx(params["conv_list_2"], stats["conv_list_2"], dtype)
    k4, b4 = _fold_convx(params["conv_list_3"], stats["conv_list_3"], dtype)
    avd_k = avd_b = None
    if stride == 2:
        dk, db = fold_bn_into_conv(
            params["avd_layer_0"]["kernel"].astype(jnp.float32), None,
            params["avd_layer_1"]["scale"], params["avd_layer_1"]["bias"],
            stats["avd_layer_1"]["mean"], stats["avd_layer_1"]["var"])
        avd_k = dk[:, :, 0, :].astype(dtype)        # (3, 3, h1)
        avd_b = db.reshape(1, -1).astype(jnp.float32)
    return FoldedCat(w1=k1[0, 0], b1=b1, k2=k2, b2=b2, k3=k3, b3=b3,
                     k4=k4, b4=b4, avd_k=avd_k, avd_b=avd_b, stride=stride)


# ------------------------------------------------------- kernel helpers

def _mask(x, wp: int, start_img_row, h_img: int, dtype):
    """Zero pad columns {0, wp-1} and rows outside [0, h_img); cast.

    The torch chain zero-pads EVERY intermediate at the image border,
    while halo rows/pad columns computed from the zero-padded input are
    relu(bias) != 0; each stage is re-zeroed before feeding the next conv.
    """
    n = x.shape[0]
    flat = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col = flat % wp
    img = flat // wp + start_img_row
    ok = (col > 0) & (col < wp - 1) & (img >= 0) & (img < h_img)
    return jnp.where(ok, x, 0).astype(dtype)


def _ext(x, back: int = 1):
    """Prepend one (and append `back`) zero sublanes so -1/+1 flat
    offsets around the array ends are sliceable."""
    z = jnp.zeros((1, x.shape[1]), x.dtype)
    parts = [z, x] + [z] * back
    return jnp.concatenate(parts, axis=0)


def _conv3x3(x, wp: int, k, b, rows_out: int):
    """Valid(rows) 3x3 conv over padded-width flat bf16 (rows_in*wp, Cin).

    Returns fp32 relu'd (rows_out*wp, Cout); output row j corresponds to
    input center row j+1; pad columns carry garbage (re-zero via _mask).
    """
    xe = _ext(x)
    n_out = rows_out * wp
    acc = None
    for dr in range(3):
        for dw in range(3):
            base = dr * wp + dw  # == 1 + (dr*wp + (dw-1)) in x coords
            d = jnp.dot(xe[base:base + n_out], k[dr, dw],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return jnp.maximum(acc + b, 0.0)


def _assemble(prev_ref, cur_ref, next_ref, r: int, halo: int):
    """(r + 2*halo, Wp, C) rows around the current block from the 3 refs."""
    return jnp.concatenate(
        [prev_ref[0, r - halo:], cur_ref[0], next_ref[0, :halo]], axis=0)


# ------------------------------------------------- stride-1 kernel

def _kernel_s1(prev_ref, cur_ref, next_ref,
               w1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref,
               k4_ref, b4_ref, out_ref, *, r: int, wp: int, h_img: int,
               dtype):
    xin = _assemble(prev_ref, cur_ref, next_ref, r, 3)   # (r+6, Wp, C)
    flat = xin.reshape((r + 6) * wp, xin.shape[-1])
    o_row = pl.program_id(1) * r  # first output image row of this block

    x1 = jnp.maximum(
        jnp.dot(flat, w1_ref[:, :], preferred_element_type=jnp.float32)
        + b1_ref[:, :], 0.0)
    x1 = _mask(x1, wp, o_row - 3, h_img, dtype)
    x2 = _mask(_conv3x3(x1, wp, k2_ref[:, :, :, :], b2_ref[:, :], r + 4),
               wp, o_row - 2, h_img, dtype)
    x3 = _mask(_conv3x3(x2, wp, k3_ref[:, :, :, :], b3_ref[:, :], r + 2),
               wp, o_row - 1, h_img, dtype)
    x4 = _mask(_conv3x3(x3, wp, k4_ref[:, :, :, :], b4_ref[:, :], r),
               wp, o_row, h_img, dtype)

    h1 = x1.shape[1]
    h2 = x2.shape[1]
    h3 = x3.shape[1]
    n = r * wp

    def center(x, off):  # center rows, drop pad columns
        return x[off * wp:off * wp + n].reshape(r, wp, -1)[:, 1:wp - 1]

    out_ref[0, :, :, 0:h1] = center(x1, 3)
    out_ref[0, :, :, h1:h1 + h2] = center(x2, 2)
    out_ref[0, :, :, h1 + h2:h1 + h2 + h3] = center(x3, 1)
    out_ref[0, :, :, h1 + h2 + h3:] = center(x4, 0)


# ------------------------------------------------- stride-2 kernel

def _kernel_s2(prev_ref, cur_ref, next_ref,
               w1_ref, b1_ref, avdk_ref, avdb_ref,
               k2_ref, b2_ref, k3_ref, b3_ref, k4_ref, b4_ref,
               out_ref, *, r: int, wp: int, c_in: int, h_img: int, dtype):
    """Input refs carry space-to-depth (rows, Wp=(W/2)+2, 4*Cin) blocks:
    lane group (2a + b) holds full-res pixel (2t+a, 2p+b); pad pairs at
    columns 0 and Wp-1. h_img is the HALF-resolution row count."""
    sin = _assemble(prev_ref, cur_ref, next_ref, r, 4)   # (r+8, Wp, 4C)
    rows_in = r + 8
    flat = sin.reshape(rows_in * wp, 4 * c_in)
    o_row = pl.program_id(1) * r

    # x1 = relu(1x1(x)) per parity quadrant, zeroed outside the image.
    def quad(a, b):
        q = flat[:, (2 * a + b) * c_in:(2 * a + b + 1) * c_in]
        x1q = jnp.maximum(
            jnp.dot(q, w1_ref[:, :], preferred_element_type=jnp.float32)
            + b1_ref[:, :], 0.0)
        return _mask(x1q, wp, o_row - 4, h_img, dtype)

    x1_00, x1_01 = quad(0, 0), quad(0, 1)
    x1_10, x1_11 = quad(1, 0), quad(1, 1)
    h1 = x1_00.shape[1]
    x1_01e = _ext(x1_01)  # -1 pair offsets sliceable
    x1_11e = _ext(x1_11)

    def s2_op(weights, bias, base: int, n_rows: int, pool: bool):
        """Fused s2 3x3 over the x1 quadrants.

        Output row j (tile half-row base+j) reads full-res rows
        2(base+j)+{-1,0,1}; quadrant/offset map (tile row t, quadrant a):
          u=2h-1 -> (h-1, a=1) ; u=2h -> (h, 0) ; u=2h+1 -> (h, 1)
        width taps (pair p, parity b):
          w=2p-1 -> (p-1, 1) ; w=2p -> (p, 0) ; w=2p+1 -> (p, 1)
        """
        n = n_rows * wp
        acc = None
        # (kernel row dr, (even, odd_ext, odd), tile-row base)
        row_taps = ((0, (x1_10, x1_11e, x1_11), base - 1),
                    (1, (x1_00, x1_01e, x1_01), base),
                    (2, (x1_10, x1_11e, x1_11), base))
        for dr, (even, odd_e, odd), rb in row_taps:
            taps = ((0, odd_e[rb * wp:rb * wp + n]),          # pair p-1
                    (1, even[rb * wp:rb * wp + n]),           # pair p
                    (2, odd[rb * wp:rb * wp + n]))            # pair p
            for dw, sl in taps:
                slf = sl.astype(jnp.float32)
                term = slf if pool else slf * weights[dr, dw].astype(
                    jnp.float32)
                acc = term if acc is None else acc + term
        if pool:
            return acc * (1.0 / 9.0)
        return acc + bias

    # avd rows [oR-3, oR+r+3) -> tile rows base 1, n r+6 (no relu).
    avd = _mask(s2_op(avdk_ref[:, :, :], avdb_ref[:, :], 1, r + 6, False),
                wp, o_row - 3, h_img, dtype)
    # pool head: exactly the output rows -> tile base 4.
    pool = _mask(s2_op(None, None, 4, r, True), wp, o_row, h_img, dtype)

    x2 = _mask(_conv3x3(avd, wp, k2_ref[:, :, :, :], b2_ref[:, :], r + 4),
               wp, o_row - 2, h_img, dtype)
    x3 = _mask(_conv3x3(x2, wp, k3_ref[:, :, :, :], b3_ref[:, :], r + 2),
               wp, o_row - 1, h_img, dtype)
    x4 = _mask(_conv3x3(x3, wp, k4_ref[:, :, :, :], b4_ref[:, :], r),
               wp, o_row, h_img, dtype)

    h2 = x2.shape[1]
    h3 = x3.shape[1]
    n = r * wp

    def center(x, off):
        return x[off * wp:off * wp + n].reshape(r, wp, -1)[:, 1:wp - 1]

    out_ref[0, :, :, 0:h1] = center(pool, 0)
    out_ref[0, :, :, h1:h1 + h2] = center(x2, 2)
    out_ref[0, :, :, h1 + h2:h1 + h2 + h3] = center(x3, 1)
    out_ref[0, :, :, h1 + h2 + h3:] = center(x4, 0)


# ------------------------------------------------------- public entries

def _full_spec(shape):
    return pl.BlockSpec(shape, lambda bi, oi: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _halo_in_specs(r, wp, c):
    """Three views of the row-padded input at blocks oi, oi+1, oi+2."""
    blk = (1, r, wp, c)
    return [
        pl.BlockSpec(blk, lambda bi, oi: (bi, oi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda bi, oi: (bi, oi + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda bi, oi: (bi, oi + 2, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pick_rows(h: int, wp: int, c_lanes: int, h1: int,
               inter_copies: int = 8) -> int:
    """Largest row block (multiple of 8, dividing h) within the VMEM budget.

    Rough model: 6 pipeline buffers of (r, wp, c_lanes) bf16 (3 halo
    specs, double-buffered) + `inter_copies` chain intermediates of
    ((r+8), wp, h1) bf16 + one fp32 accumulator (s2 keeps 4 quadrants +
    2 ext copies alive, so it passes a higher copy count).
    """
    best = 0
    for cand in range(8, 65, 8):
        if h % cand:
            continue
        est = (6 * cand * wp * c_lanes * 2
               + (cand + 8) * wp * h1 * (inter_copies * 2 + 4))
        if est <= VMEM_BUDGET:
            best = cand
        elif best == 0:
            best = cand  # smallest divisor; let Mosaic be the judge
            break
    return best


def fused_cat_s1(x: jax.Array, fp: FoldedCat,
                 interpret: bool = False) -> jax.Array:
    """Stride-1 CatBottleneck inference: x (B,H,W,C) -> (B,H,W,out)."""
    b, h, w, c = x.shape
    h1 = fp.w1.shape[1]
    out_c = h1 + fp.k2.shape[3] + fp.k3.shape[3] + fp.k4.shape[3]
    wp = w + 2
    r = _pick_rows(h, wp, c, h1)
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (r, r), (1, 1), (0, 0)))

    kern = functools.partial(_kernel_s1, r=r, wp=wp, h_img=h, dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(b, h // r),
        in_specs=_halo_in_specs(r, wp, c) + [
            _full_spec(fp.w1.shape), _full_spec(fp.b1.shape),
            _full_spec(fp.k2.shape), _full_spec(fp.b2.shape),
            _full_spec(fp.k3.shape), _full_spec(fp.b3.shape),
            _full_spec(fp.k4.shape), _full_spec(fp.b4.shape),
        ],
        out_specs=pl.BlockSpec((1, r, w, out_c),
                               lambda bi, oi: (bi, oi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * b * h * w * (c * h1
                             + 9 * (h1 * fp.k2.shape[3]
                                    + fp.k2.shape[3] * fp.k3.shape[3]
                                    + fp.k3.shape[3] * fp.k4.shape[3]))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_c), dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 3
            + b * h * w * out_c * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, xp, fp.w1, fp.b1, fp.k2, fp.b2, fp.k3, fp.b3, fp.k4, fp.b4)


def space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), lane group 2a+b = pixel parity
    (row parity a, col parity b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def fused_cat_s2(x: jax.Array, fp: FoldedCat,
                 interpret: bool = False) -> jax.Array:
    """Stride-2 CatBottleneck inference: x (B,H,W,C) -> (B,H/2,W/2,out)."""
    b, h, w, c = x.shape
    h2_, w2 = h // 2, w // 2
    h1 = fp.w1.shape[1]
    out_c = h1 + fp.k2.shape[3] + fp.k3.shape[3] + fp.k4.shape[3]
    wp = w2 + 2
    r = _pick_rows(h2_, wp, 4 * c, h1, inter_copies=14)
    dtype = x.dtype

    s = space_to_depth2(x)
    sp = jnp.pad(s, ((0, 0), (r, r), (1, 1), (0, 0)))

    kern = functools.partial(_kernel_s2, r=r, wp=wp, c_in=c, h_img=h2_,
                             dtype=dtype)
    grid_spec = pl.GridSpec(
        grid=(b, h2_ // r),
        in_specs=_halo_in_specs(r, wp, 4 * c) + [
            _full_spec(fp.w1.shape), _full_spec(fp.b1.shape),
            _full_spec(fp.avd_k.shape), _full_spec(fp.avd_b.shape),
            _full_spec(fp.k2.shape), _full_spec(fp.b2.shape),
            _full_spec(fp.k3.shape), _full_spec(fp.b3.shape),
            _full_spec(fp.k4.shape), _full_spec(fp.b4.shape),
        ],
        out_specs=pl.BlockSpec((1, r, w2, out_c),
                               lambda bi, oi: (bi, oi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * b * h2_ * w2 * (4 * c * h1
                                + 9 * h1
                                + 9 * (h1 * fp.k2.shape[3]
                                       + fp.k2.shape[3] * fp.k3.shape[3]
                                       + fp.k3.shape[3] * fp.k4.shape[3]))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h2_, w2, out_c), dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=s.size * s.dtype.itemsize * 3
            + b * h2_ * w2 * out_c * s.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(sp, sp, sp, fp.w1, fp.b1, fp.avd_k, fp.avd_b,
      fp.k2, fp.b2, fp.k3, fp.b3, fp.k4, fp.b4)


def fused_cat_bottleneck(x: jax.Array, fp: FoldedCat,
                         interpret: bool = False) -> jax.Array:
    if fp.stride == 2:
        return fused_cat_s2(x, fp, interpret=interpret)
    return fused_cat_s1(x, fp, interpret=interpret)


def supported(x_shape: Tuple[int, ...], stride: int) -> bool:
    """Shapes the kernels handle: even H/W for s2, 8-divisible row count."""
    _, h, w, c = x_shape
    if stride == 2:
        return (h % 2 == 0 and w % 2 == 0
                and _pick_rows(h // 2, w // 2 + 2, 4 * c, 64) > 0)
    return _pick_rows(h, w + 2, c, 64) > 0
