"""Ablation timings for the inference hot path (real chip).

Splits bench.py's metric into components to locate remaining headroom:
  feats   = STDC813 backbone + context path (features method, no heads up)
  full    = feats + fused Pallas upsample(align_corners)+argmax  (the bench)

Usage: python tools/ablate_infer.py [batch ...]   (default 128 192)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import init_bisenet_variables
from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax

H, W, CHAIN, REPS = 512, 1024, 32, 3


def timed(fn, variables, images, batch):
    np.asarray(fn(variables, images))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(variables, images))
        best = min(best, time.perf_counter() - t0)
    return batch * CHAIN / best


def main():
    batches = [int(b) for b in sys.argv[1:]] or [128, 192]
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, H, W, 3))

    @jax.jit
    def feats_only(variables, images):
        def body(carry, _):
            f8, _f16, _f32 = model.apply(variables, carry, train=False,
                                         method=type(model).features)
            s = jnp.sum(f8).astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), jnp.sum(f8)
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    @jax.jit
    def full(variables, images):
        def body(carry, _):
            f8, _f16, _f32 = model.apply(variables, carry, train=False,
                                         method=type(model).features)
            pred = upsample_argmax(f8, (H, W))
            s = jnp.sum(pred).astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), jnp.sum(pred)
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    rng = np.random.default_rng(0)
    for bs in batches:
        images = jnp.asarray(rng.standard_normal((bs, H, W, 3)),
                             jnp.bfloat16)
        f = timed(feats_only, variables, images, bs)
        g = timed(full, variables, images, bs)
        print(f"bs={bs}: feats={f:.1f} img/s  full={g:.1f} img/s  "
              f"head_share={(1 - g / f) * 100:.1f}%")


if __name__ == "__main__":
    main()
