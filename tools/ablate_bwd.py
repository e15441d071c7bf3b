"""Per-stage ablation of the BACKWARD pass on the real chip.

The train step is gradient-bound (fwd 1299 vs step 654 img/s at bs=128;
conv bwd ~19% MXU — CLAUDE.md). This attributes backward time to layer
groups: for each truncation k of the backbone (then the full 3-head
fused-CE loss), time value_and_grad of a surrogate scalar sum through
the truncated net with bench.py's scan-chain protocol; successive deltas
= fwd+bwd cost per group (subtract ablate_backbone.py's fwd-only deltas
to isolate bwd).

  k=1 stem 3->32 s2 | k=2 ->64 s4 | k=4 ->256 s8 | k=6 ->512 s16 |
  k=8 ->1024 s32 | 'heads' = full supervised loss (context path + FFM +
  3x fused upsample+CE)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1700 \
    python tools/ablate_bwd.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables)

H, W, CHAIN, REPS = 512, 1024, 16, 3


def bench_chained(fn, variables, images, *extra):
    @jax.jit
    def chained(variables, images, *extra):
        def body(carry, _):
            out = fn(variables, carry, *extra)
            s = out.astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), out
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    np.asarray(chained(variables, images, *extra))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(variables, images, *extra))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, H, W, 3))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 19, (bs, H, W)), jnp.int32)

    prev = 0.0
    for k in (1, 2, 4, 6, 8):
        def upto(mdl, x, _k=k):
            for idx in range(_k):
                x = mdl.cp.backbone.features[idx](x, train=False)
            return x

        def vg(variables, x):
            def loss(params):
                out = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, method=upto)
                return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-9)

            val, grads = jax.value_and_grad(loss)(variables["params"])
            # fold grads into one scalar so the chain depends on the bwd
            acc = val
            for leaf in jax.tree.leaves(grads):
                acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
            return acc

        best = bench_chained(vg, variables, images)
        ms = best / CHAIN / bs * 1e3
        print(f"k={k}: {ms:.3f} ms/img fwd+bwd (delta {ms - prev:+.3f})",
              flush=True)
        prev = ms

    # full supervised loss (what make_train_step differentiates)
    from dasemanticsegmentationaml_tpu.ops.pallas.fused_ce import (
        cross_entropy_upsampled)

    def vg_full(variables, x, y):
        def loss(params):
            (f, f16, f32), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                method=type(model).features)
            hw = x.shape[1:3]
            return (cross_entropy_upsampled(f, y, hw, 255)
                    + cross_entropy_upsampled(f16, y, hw, 255)
                    + cross_entropy_upsampled(f32, y, hw, 255))

        val, grads = jax.value_and_grad(loss)(variables["params"])
        acc = val
        for leaf in jax.tree.leaves(grads):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
        return acc

    best = bench_chained(vg_full, variables, images, labels)
    ms = best / CHAIN / bs * 1e3
    print(f"full loss: {ms:.3f} ms/img fwd+bwd (delta over k=8 "
          f"{ms - prev:+.3f})", flush=True)


if __name__ == "__main__":
    main()
