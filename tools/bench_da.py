"""Adversarial-DA step throughput on the real chip (secondary bench).

Measures the full 4-phase DA step (reference train.py:192-262) at the
reference's 1024x512 resolution.  The loss readback serializes the chain
(see bench.py's protocol notes on async-dispatch runtimes).

Measured on v5e (batch 8+8): 113.4 img/s unfused -> 115.6 img/s with the
fused upsample+CE aux heads. Batch sweep (source = target = argv[1],
default 8): 118.9 @ 16+16, 130.2 @ 32+32, 136.0 @ 64+64 (=128
images/step, the same pre-HBM-cliff peak as the supervised step).

DA_AUG=<menu> additionally runs the device prepare path (uint8 ->
augment -> normalize -> remap) on the SOURCE batch inside the measured
loop — the production config of reference train_DA with --aug_type.
DA_AUG_FAST=1 uses the 3-shear rotation (--fast_device_geometry).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_da.py [B]
"""
import os, sys, time, numpy as np, jax, jax.numpy as jnp
from dasemanticsegmentationaml_tpu.models import BiSeNet, build_discriminator
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables, unused_param_mask)
from dasemanticsegmentationaml_tpu.train import create_train_state
from dasemanticsegmentationaml_tpu.train.adversarial import make_da_step
from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

H, W, ITERS = 512, 1024, 8
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8  # source = target batch
AUG = os.environ.get("DA_AUG")            # None | CS-HF | H-RP | B-GS-R
AUG_FAST = os.environ.get("DA_AUG_FAST") == "1"
g_model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
g_vars = init_bisenet_variables(g_model, jax.random.PRNGKey(0), (1, H, W, 3))
d_model = build_discriminator(19, dtype=jnp.bfloat16)
d_vars = d_model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 19)))
g_opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=5e-4,
                       mask=unused_param_mask(g_vars["params"]))
d_opt = make_optimizer("adam", 1e-3, betas=(0.9, 0.99))
g_state = create_train_state(g_vars, g_opt)
d_state = create_train_state(d_vars, d_opt)
rng = np.random.default_rng(0)
src = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
lab = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
tgt = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
step = make_da_step(g_model, d_model, g_opt, d_opt, lambda_adv=1e-3)

if AUG:
    # production path: raw uint8 source batch through prepare_batch
    # (augment + normalize + LUT remap) each iteration, like the CLI's
    # prepare_source; the step consumes its output directly on device
    from dasemanticsegmentationaml_tpu.data import prepare_batch

    src_u8 = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.uint8)
    lab_u8 = jnp.asarray(rng.integers(0, 35, (B, H, W)), jnp.uint8)
    key = jax.random.PRNGKey(0)

    def run_iter(g_state, d_state, i):
        x, y = prepare_batch(src_u8, lab_u8,
                             key=jax.random.fold_in(key, i), aug_type=AUG,
                             remap=True, dtype=jnp.bfloat16,
                             fast_geometry=AUG_FAST)
        return step(g_state, d_state, x, y, tgt, 0.01, 1e-3)
else:
    def run_iter(g_state, d_state, i):
        return step(g_state, d_state, src, lab, tgt, 0.01, 1e-3)

t0 = time.time()
g_state, d_state, m = run_iter(g_state, d_state, 0)
float(m["loss_G"])
print(f"compile+first: {time.time()-t0:.0f}s")
t0 = time.perf_counter()
for i in range(ITERS):
    g_state, d_state, m = run_iter(g_state, d_state, i + 1)
float(m["loss_G"])  # readback serializes
dt = time.perf_counter() - t0
tag = f" aug={AUG}{' fast' if AUG_FAST else ''}" if AUG else ""
print(f"DA step: {B*ITERS/dt:.1f} source img/s (batch {B}+{B}){tag}")
