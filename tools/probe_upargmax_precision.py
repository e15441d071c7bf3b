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

from dasemanticsegmentationaml_tpu.ops.pallas.upsample_argmax import (
    _pallas_call,
)

B, H, W, C = 128, 64, 128, 19
OUT = (512, 1024)
CHAIN, REPS = 32, 3


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
        # production split path (upsample_argmax routes bf16 inputs here)
        "SPLIT": functools.partial(_pallas_call, split=True),
        # row-block sweep result (measured): 64/128/256 all ~56-57
        # us/img; 512 exceeds the 16 MB scoped-VMEM limit and WEDGES
        # THE COMPILE SERVICE for hours -- never probe it again.
        # Mosaic multi-buffering via parallel dimension semantics:
        "SPLITPAR": functools.partial(_pallas_call, split=True,
                                      parallel_grid=True),
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
