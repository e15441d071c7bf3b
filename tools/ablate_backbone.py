"""Per-stage ablation of the STDC813 backbone on the real chip.

Times features[0:k] partial forwards (k = cumulative layer count) with
bench.py's on-device scan-chain protocol, so successive deltas attribute
time to each layer group:
  k=1  stem ConvX 3->32 s2      (stride 2)
  k=2  ConvX 32->64 s2          (stride 4)
  k=4  2x CatBottleneck -> 256  (stride 8)
  k=6  2x CatBottleneck -> 512  (stride 16)
  k=8  2x CatBottleneck -> 1024 (stride 32)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_backbone.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models.stdcnet import STDCNet813

H, W, CHAIN, REPS = 512, 1024, 32, 3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = STDCNet813(dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.bfloat16)

    def full_init(mdl, x):
        return mdl(x, train=False)

    variables = model.init(jax.random.PRNGKey(0), x0, method=full_init)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)

    prev = 0.0
    for k in (1, 2, 4, 6, 8):
        def upto(mdl, x):
            for idx in range(k):
                x = mdl.features[idx](x, train=False)
            return x

        @jax.jit
        def chained(variables, images):
            def body(carry, _):
                out = model.apply(variables, carry, method=upto)
                s = jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30)
                return carry + s.astype(carry.dtype), jnp.sum(out)
            _, sums = jax.lax.scan(body, images, None, length=CHAIN)
            return sums

        np.asarray(chained(variables, images))  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(variables, images))
            best = min(best, time.perf_counter() - t0)
        ms = best / (bs * CHAIN) * 1e3
        print(f"k={k}: {bs * CHAIN / best:8.1f} img/s  {ms:.4f} ms/img  "
              f"delta={ms - prev:.4f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
