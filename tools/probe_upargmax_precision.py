"""Precision-policy probe for the fused upsample+argmax kernel (real chip).

The kernel's two tap-matrix dots run at fp32 Precision.HIGHEST = 6 MXU
passes (CLAUDE.md perf rules); Mosaic supports only DEFAULT/HIGHEST
(Precision.HIGH raises NotImplementedError in the dot lowering rule).
Model logits are bf16, so most of that fidelity is below the input's own
quantization. Variants probed:

  HIGHEST  - production kernel (exact vs fp32 reference)
  DEFAULT  - 1-pass bf16 dots (taps rounded to 8-bit mantissa)
  SPLIT    - taps as bf16 hi+lo pairs, logits cast bf16 (exact for
             bf16-sourced logits): stage1 = 2 one-pass dots, stage2 =
             3 one-pass dots per class (hi@hi + lo@hi + hi@lo), i.e.
             ~16-bit-exact interpolation at ~1/2 the HIGHEST passes.

Reports us/img and argmax mismatch fraction vs HIGHEST on
bf16-quantized logits (the production eval case).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_upargmax_precision.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from dasemanticsegmentationaml_tpu.ops.pallas.upsample_argmax import (
    _pallas_call,
    _row_block,
    _tap_matrix,
)

B, H, W, C = 128, 64, 128, 19
OUT = (512, 1024)
CHAIN, REPS = 32, 3


def _split(m: np.ndarray):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _make_split_kernel(c: int, row_blk: int):
    f32 = jnp.float32

    def _kernel(x_ref, mrh_ref, mrl_ref, mch_ref, mcl_ref, out_ref):
        xb = x_ref[0].astype(jnp.bfloat16)  # exact for bf16-sourced logits
        rows = (jnp.dot(mrh_ref[:, :], xb, preferred_element_type=f32)
                + jnp.dot(mrl_ref[:, :], xb, preferred_element_type=f32))
        r_hi = rows.astype(jnp.bfloat16)
        r_lo = (rows - r_hi.astype(f32)).astype(jnp.bfloat16)
        w = mch_ref.shape[0]
        out_w = mch_ref.shape[1]
        best = jnp.full((row_blk, out_w), -jnp.inf, f32)
        idx = jnp.zeros((row_blk, out_w), jnp.int32)
        for j in range(c):
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


def _split_call(logits_t: jax.Array, out_hw):
    from jax.experimental.pallas import tpu as pltpu

    b, h, c, w = logits_t.shape
    out_h, out_w = out_hw
    mrh, mrl = _split(_tap_matrix(h, out_h, transpose=True))
    mch, mcl = _split(_tap_matrix(w, out_w, transpose=False))
    row_blk = _row_block(out_h)
    x2 = logits_t.reshape(b, h, c * w)

    grid_spec = pl.GridSpec(
        grid=(b, out_h // row_blk),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda bi, oi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_blk, h), lambda bi, oi: (oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_blk, h), lambda bi, oi: (oi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda bi, oi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_blk, out_w),
                               lambda bi, oi: (bi, oi, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_split_kernel(c, row_blk),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        grid_spec=grid_spec,
    )(x2, mrh, mrl, mch, mcl)


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.standard_normal((B, H, W, C)) * 4.0, jnp.bfloat16
    ).astype(jnp.float32)
    logits_t = jnp.transpose(logits, (0, 1, 3, 2))

    variants = {
        "HIGHEST": functools.partial(
            _pallas_call, precision=jax.lax.Precision.HIGHEST),
        "DEFAULT": functools.partial(
            _pallas_call, precision=jax.lax.Precision.DEFAULT),
        "SPLIT": _split_call,
    }
    ref = None
    for name, call in variants.items():
        @jax.jit
        def chained(x, call=call):
            def body(carry, _):
                out = call(carry, OUT)
                s = jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30)
                return carry + s.astype(carry.dtype), jnp.sum(out)
            _, sums = jax.lax.scan(body, x, None, length=CHAIN)
            return sums

        np.asarray(chained(logits_t))  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(logits_t))
            best = min(best, time.perf_counter() - t0)
        us = best / (B * CHAIN) * 1e6
        out = np.asarray(call(logits_t, OUT))
        if ref is None:
            ref = out
        mism = (out != ref).mean()
        print(f"{name:8s}: {us:7.2f} us/img  mismatch_vs_HIGHEST={mism:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
