"""Does rematerialization lift the post-128 HBM cliff on the train step?

Measured context (CLAUDE.md): supervised step peaks at 653.6 img/s @ bs=128
and REGRESSES to 506.7 @ bs=192 -- HBM pressure. Forward is only ~0.37
ms/img of a ~1.5 ms/img step, so full forward remat trades <25% extra
FLOPs for dropping almost all activation storage. If the cliff is
activation residency, remat at bs>=192 should beat 507.

One config per invocation (single fresh compile -- fits a flaky
compile-service window):

  PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/probe_remat.py <batch> <none|full>

Times value_and_grad only (optimizer cost is ~0 per tools/ablate_train.py:
grad 513.8 vs step 511.5 img/s @ bs=64).

Measured (v5e, 2026-08-17): remat=full bs=192 -> 388.0 img/s, vs 506.7
for the no-remat step at the same batch. Remat LOSES: the cliff is not
activation residency (the inference-only path, which stores no
activations, has the same cliff at bs=160). Rejected.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import init_bisenet_variables
from dasemanticsegmentationaml_tpu.ops.pallas.fused_ce import (
    cross_entropy_upsampled)

H, W, ITERS = 512, 1024, 8


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, H, W, 3))

    def features(params, stats, x):
        feats, mut = model.apply({"params": params, "batch_stats": stats},
                                 x, train=True, mutable=["batch_stats"],
                                 method=type(model).features)
        return feats, mut

    if mode == "full":
        features = jax.checkpoint(features)
    elif mode != "none":
        raise SystemExit(f"unknown remat mode {mode!r}")

    def loss_fn(params, stats, x, y):
        feats, _ = features(params, stats, x)
        return (cross_entropy_upsampled(feats[0], y, (H, W), 255)
                + cross_entropy_upsampled(feats[1], y, (H, W), 255)
                + cross_entropy_upsampled(feats[2], y, (H, W), 255))

    grad = jax.jit(jax.value_and_grad(loss_fn))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 19, (bs, H, W)), jnp.int32)

    out = grad(v["params"], v["batch_stats"], x, y)
    float(out[0])  # warmup + true sync via readback
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = grad(v["params"], v["batch_stats"], x, y)
    float(out[0])
    dt = time.perf_counter() - t0
    print(f"remat={mode} bs={bs}: grad={bs * ITERS / dt:7.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
