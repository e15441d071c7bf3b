"""Supervised train-step ablation on the real chip.

Times three programs at the given batch size:
  fwd    - features forward + fused upsample+CE loss (no grad)
  grad   - value_and_grad of the same loss (no optimizer)
  step   - the production train step (grad + SGD update + BN stats)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_train.py [bs...]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables, unused_param_mask)
from dasemanticsegmentationaml_tpu.train import (create_train_state,
                                                 make_train_step)
from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

H, W, ITERS = 512, 1024, 8


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    r = jax.tree.leaves(out)[0]
    float(jnp.sum(r))  # true sync via readback
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return time.perf_counter() - t0


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 64]
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, H, W, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=1e-4,
                         mask=unused_param_mask(v["params"]))

    from dasemanticsegmentationaml_tpu.ops.pallas.fused_ce import (
        cross_entropy_upsampled)

    def loss_fn(params, stats, x, y):
        feats, _ = model.apply({"params": params, "batch_stats": stats},
                               x, train=True, mutable=["batch_stats"],
                               method=type(model).features)
        return (cross_entropy_upsampled(feats[0], y, (H, W), 255)
                + cross_entropy_upsampled(feats[1], y, (H, W), 255)
                + cross_entropy_upsampled(feats[2], y, (H, W), 255))

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn))

    for bs in batches:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)
        y = jnp.asarray(rng.integers(0, 19, (bs, H, W)), jnp.int32)

        # deep-copy: the production step donates its state, and the state
        # aliases `v`'s buffers -- donation would delete them for the
        # next batch size otherwise
        state = create_train_state(jax.tree.map(jnp.copy, v), opt)
        step = make_train_step(model, opt)

        step_only = os.environ.get("STEP_ONLY") == "1"
        if not step_only:
            dt_f = timed(fwd, v["params"], v["batch_stats"], x, y)
            dt_g = timed(grad, v["params"], v["batch_stats"], x, y)

        def run_step(s, x, y):
            s2, loss = step(s, x, y, 0.01)
            return loss
        # step donates state; re-create per call is wrong -- chain instead
        s = state
        s, loss = step(s, x, y, 0.01)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, loss = step(s, x, y, 0.01)
        float(loss)
        dt_s = time.perf_counter() - t0

        n = bs * ITERS
        if step_only:
            print(f"bs={bs}: step={n/dt_s:7.1f} img/s", flush=True)
        else:
            print(f"bs={bs}: fwd={n/dt_f:7.1f} img/s"
                  f"  grad={n/dt_g:7.1f} img/s"
                  f"  step={n/dt_s:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
