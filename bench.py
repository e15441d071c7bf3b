"""Benchmark: images/sec/chip, BiSeNet-STDC813 inference at 1024x512.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: N forwards are chained ON DEVICE inside one jit via lax.scan
with a real (numerically negligible) data dependency between iterations,
and a single host readback at the end.  This measures pure device
throughput and is robust to async-dispatch runtimes where
``block_until_ready`` returns before the computation finishes (observed
on tunneled backends: naive per-call timing reported >100k img/s,
physically impossible at ~27 GFLOP/image).

The timed path is the real eval hot path (reference train.py:36-38):
features at stride 8 -> fused Pallas bilinear-upsample(align_corners)
+argmax on TPU (ops/pallas/upsample_argmax.py), XLA resize+argmax
elsewhere.

Baseline: the reference publishes no numbers (BASELINE.md); the only
quantitative anchor in its README is the upstream STDC1-Seg50 capability
citation of 250.4 FPS on a GTX 1080Ti (reference README.md:83). We report
vs that anchor; the north-star is >=5x (BASELINE.json).
"""

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 250.4  # STDC1-Seg50 @ 1080Ti, reference README.md:83
CHAIN = 32            # forwards chained on device per measurement


def bench_forward(batch_size: int, height: int = 512, width: int = 1024,
                  reps: int = 3, int8: bool = False) -> float:
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables,
    )
    from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, height, width, 3))
    if int8:
        # opt-in int8 PTQ path (BENCH_INT8=1): the measured-best 'head_ch'
        # preset quantizes the MXU-bound main-head 3x3 plus the two
        # single-consumer context-path head convs (ops/quantize.py).
        from dasemanticsegmentationaml_tpu.ops.quantize import (
            PRESET_FILTERS, quantize_model)
        rng_c = np.random.default_rng(7)
        calib = [jnp.asarray(rng_c.standard_normal((2, height, width, 3)),
                             jnp.bfloat16)]
        model, variables = quantize_model(
            model, variables, calib, filter_fn=PRESET_FILTERS["head_ch"])

    @jax.jit
    def chained(variables, images):
        def body(carry, _):
            feat, _f16, _f32 = model.apply(variables, carry, train=False,
                                           method=type(model).features)
            pred = upsample_argmax(feat, (height, width))
            # forge a data dependency on pred so iterations serialize and
            # nothing is dead-code-eliminated; the perturbation is ~1e-24.
            s = jnp.sum(pred).astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), jnp.sum(pred)
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch_size, height, width, 3)), jnp.bfloat16)

    np.asarray(chained(variables, images))  # compile + warm
    best_dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(variables, images))  # full host readback = sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    return batch_size * CHAIN / best_dt


def bench_train_step(batch_size: int = 128, height: int = 512,
                     width: int = 1024, iters: int = 8) -> float:
    """Supervised train-step throughput (secondary metric)."""
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables, unused_param_mask)
    from dasemanticsegmentationaml_tpu.train import (create_train_state,
                                                     make_train_step)
    from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0),
                               (1, height, width, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=1e-4,
                         mask=unused_param_mask(v["params"]))
    state = create_train_state(v, opt)
    step = make_train_step(model, opt)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch_size, height, width, 3)),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 19, (batch_size, height, width)),
                    jnp.int32)
    state, loss = step(state, x, y, 0.01)
    float(loss)  # sync after compile
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, x, y, 0.01)
    float(loss)  # the loss readback serializes the chain
    return batch_size * iters / (time.perf_counter() - t0)


def bench_da_step(batch_size: int = 64, height: int = 512,
                  width: int = 1024, iters: int = 8) -> float:
    """Adversarial-DA 4-phase step throughput (tertiary metric).

    Measured on v5e (tools/bench_da.py protocol): 115.6 source img/s at
    batch 8+8 (the reference's config), 118.9 at 16+16, 130.2 at 32+32,
    136.0 at 64+64 (source+target = 128 images/step, the same pre-HBM-
    cliff peak as the supervised step)."""
    from dasemanticsegmentationaml_tpu.models import (BiSeNet,
                                                      build_discriminator)
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables, unused_param_mask)
    from dasemanticsegmentationaml_tpu.train import (create_train_state,
                                                     make_da_step)
    from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

    g_model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    g_vars = init_bisenet_variables(g_model, jax.random.PRNGKey(0),
                                    (1, height, width, 3))
    d_model = build_discriminator(19, dtype=jnp.bfloat16)
    d_vars = d_model.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, height, width, 19)))
    g_opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=5e-4,
                           mask=unused_param_mask(g_vars["params"]))
    d_opt = make_optimizer("adam", 1e-3, betas=(0.9, 0.99))
    g_state = create_train_state(g_vars, g_opt)
    d_state = create_train_state(d_vars, d_opt)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((batch_size, height, width, 3)),
                      jnp.bfloat16)
    lab = jnp.asarray(rng.integers(0, 19, (batch_size, height, width)),
                      jnp.int32)
    tgt = jnp.asarray(rng.standard_normal((batch_size, height, width, 3)),
                      jnp.bfloat16)
    step = make_da_step(g_model, d_model, g_opt, d_opt, lambda_adv=1e-3)
    g_state, d_state, m = step(g_state, d_state, src, lab, tgt, 0.01, 1e-3)
    float(m["loss_G"])  # sync after compile
    t0 = time.perf_counter()
    for _ in range(iters):
        g_state, d_state, m = step(g_state, d_state, src, lab, tgt,
                                   0.01, 1e-3)
    float(m["loss_G"])  # readback serializes the chain
    return batch_size * iters / (time.perf_counter() - t0)


def main():
    backend = jax.default_backend()
    # batch 128 measured best on v5e: 16/32 ~40% lower, 64 = 1944,
    # 128 = 2664, 144 = 1987, 160 = 1981 (the HBM cliff is a step
    # function right after 128), 256 worse still. Single point keeps
    # the bench well inside the driver's budget despite ~2 min remote
    # compiles per program.
    batches = [128] if backend == "tpu" else [2]
    # Headline = the measured-best SUPPORTED config: int8 PTQ with the
    # 'head_ch' preset (2796-2800 vs 2659.7 bf16 img/s at bs=128 on v5e,
    # reproduced twice). Promoted to default after parity qualification:
    # tests/test_eval_parity.py::test_int8_head_ch_parity_through_oracle
    # pins its mIoU within 8.0e-6 of the reference's own fp32 val() on the
    # end-to-end synthetic oracle, and the int8 serving artifact replays
    # EXACTLY vs the live quantized jit on chip (tools/bench_serve.py).
    # BENCH_BF16=1 measures the bf16 parity path instead. CPU smoke runs
    # stay bf16 (calibration compiles aren't worth it off-chip).
    int8 = backend == "tpu" and os.environ.get("BENCH_BF16") != "1"
    best, best_bs = 0.0, batches[0]
    for bs in batches:
        try:
            fps = bench_forward(bs, int8=int8)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            continue
        print(f"bs={bs}: {fps:.1f} img/s", file=sys.stderr)
        if fps > best:
            best, best_bs = fps, bs
    # The train-step program (fused upsample+CE custom-VJP kernels)
    # takes several minutes of remote compile; keep the primary metric's
    # runtime bounded and only measure training when asked.
    train_fps = 0.0
    if backend == "tpu" and os.environ.get("BENCH_TRAIN") == "1":
        try:
            train_fps = bench_train_step()
        except Exception:
            traceback.print_exc(file=sys.stderr)
    da_fps = 0.0
    if backend == "tpu" and os.environ.get("BENCH_DA") == "1":
        try:
            da_fps = bench_da_step()
        except Exception:
            traceback.print_exc(file=sys.stderr)
    result = {
        "metric": "images_per_sec_per_chip_bisenet_stdc813_1024x512_infer",
        "value": round(best, 2),
        "unit": "images/sec",
        "vs_baseline": round(best / BASELINE_FPS, 3),
        "batch_size": best_bs,
        "backend": backend,
        "dtype": "int8+bfloat16" if int8 else "bfloat16",
    }
    if train_fps:
        result["train_images_per_sec"] = round(train_fps, 2)
    if da_fps:
        result["da_source_images_per_sec"] = round(da_fps, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
