"""Split the supervised loss segment's fwd+bwd cost (real chip).

ablate_bwd.py found the full loss costs 1.507 ms/img fwd+bwd at bs=128
while the backbone alone is 0.754 — the context path + FFM + heads +
3x fused upsample+CE segment is HALF the step. This splits that 0.753:

  variant 'sum'   : features() + surrogate sums  (no CE kernels at all)
  variant 'ce1'   : fused CE on the main head, sums on aux heads
  variant 'ce3'   : fused CE on all three heads  (the real loss)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1700 \
    python tools/ablate_loss_bwd.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables)
from dasemanticsegmentationaml_tpu.ops.pallas.fused_ce import (
    cross_entropy_upsampled)

H, W, CHAIN, REPS = 512, 1024, 16, 3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, H, W, 3))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 19, (bs, H, W)), jnp.int32)

    def head_loss(f, y, hw, use_ce):
        if use_ce:
            return cross_entropy_upsampled(f, y, hw, 255)
        return jnp.sum(f.astype(jnp.float32)) * jnp.float32(1e-9)

    for name, flags in (("sum", (False, False, False)),
                        ("ce1", (True, False, False)),
                        ("ce3", (True, True, True))):
        def vg(variables, x, y, _flags=flags):
            def loss(params):
                (f, f16, f32), _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                    method=type(model).features)
                hw = x.shape[1:3]
                return (head_loss(f, y, hw, _flags[0])
                        + head_loss(f16, y, hw, _flags[1])
                        + head_loss(f32, y, hw, _flags[2]))

            val, grads = jax.value_and_grad(loss)(variables["params"])
            acc = val
            for leaf in jax.tree.leaves(grads):
                acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
            return acc

        @jax.jit
        def chained(variables, images, labels):
            def body(carry, _):
                out = vg(variables, carry, labels)
                s = out.astype(jnp.float32) * jnp.float32(1e-30)
                return carry + s.astype(carry.dtype), out
            _, sums = jax.lax.scan(body, images, None, length=CHAIN)
            return sums

        np.asarray(chained(variables, images, labels))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(variables, images, labels))
            best = min(best, time.perf_counter() - t0)
        ms = best / CHAIN / bs * 1e3
        print(f"{name}: {ms:.3f} ms/img fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
