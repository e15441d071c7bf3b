"""Does emitting bf16 softmax maps for D speed up the DA step? (real chip)

The DA step materializes fp32 softmax maps at full resolution
(B x 512 x 1024 x 19 fp32 ~ 40 MB/img) that the bf16 discriminator
immediately casts down (models/discriminator.py `x.astype(self.dtype)`).
If XLA does not fuse that cast into the producing fusion, a bf16
materialization halves the HBM traffic of phases 2-4's D inputs.

Times make_da_step as-is vs with a monkeypatched softmax->bf16 cast.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_da_probs_dtype.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet, build_discriminator
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables, unused_param_mask)
from dasemanticsegmentationaml_tpu.train import create_train_state
from dasemanticsegmentationaml_tpu.train.adversarial import make_da_step
from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

H, W, B, ITERS = 512, 1024, 8, 8


def bench(step, g_state, d_state, src, lab, tgt):
    g, d, m = step(g_state, d_state, src, lab, tgt, 0.01, 1e-3)
    float(m["loss_G"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g, d, m = step(g, d, src, lab, tgt, 0.01, 1e-3)
    float(m["loss_G"])
    return B * ITERS / (time.perf_counter() - t0)


def main():
    g_model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    g_vars = init_bisenet_variables(g_model, jax.random.PRNGKey(0),
                                    (1, H, W, 3))
    d_model = build_discriminator(19, dtype=jnp.bfloat16)
    d_vars = d_model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 19)))
    g_opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=5e-4,
                           mask=unused_param_mask(g_vars["params"]))
    d_opt = make_optimizer("adam", 1e-3, betas=(0.9, 0.99))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    lab = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    tgt = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)

    for name, patch in [("fp32 probs", False), ("bf16 probs", True)]:
        if patch:
            import dasemanticsegmentationaml_tpu.train.adversarial as adv
            orig = jax.nn.softmax

            def softmax_bf16(x, axis=-1):
                return orig(x, axis=axis).astype(jnp.bfloat16)

            adv.jax.nn.softmax = softmax_bf16  # module-local view
        step = make_da_step(g_model, d_model, g_opt, d_opt,
                            lambda_adv=1e-3)
        g_state = create_train_state(
            jax.tree.map(jnp.copy, g_vars), g_opt)
        d_state = create_train_state(
            jax.tree.map(jnp.copy, d_vars), d_opt)
        fps = bench(step, g_state, d_state, src, lab, tgt)
        print(f"{name}: {fps:.1f} source img/s", flush=True)
        if patch:
            adv.jax.nn.softmax = orig


if __name__ == "__main__":
    main()
