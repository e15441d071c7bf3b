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

Robustness (round 5): the remote compile service on this stack hangs
for hours at a time (fresh compiles block at ~0 CPU and ignore SIGTERM;
round 4's driver record was rc=124/null because the int8 path needs two
full-model compiles before printing anything).  main() therefore runs
each measurement in a SUBPROCESS with a wall-clock deadline, SIGKILLed
by PID on expiry (the wedge playbook): the bf16 program first (single
program, most likely warm in the remote compile cache), then the int8
upgrade only with remaining budget, and prints the best COMPLETED
result.  A compile stall can cost the int8 upgrade but can no longer
cost the round its record.

Baseline: the reference publishes no numbers (BASELINE.md); the only
quantitative anchor in its README is the upstream STDC1-Seg50 capability
citation of 250.4 FPS on a GTX 1080Ti (reference README.md:83). We report
vs that anchor; the north-star is >=5x (BASELINE.json).
"""

import json
import os
import subprocess
import sys
import time
import traceback

BASELINE_FPS = 250.4  # STDC1-Seg50 @ 1080Ti, reference README.md:83
# forwards chained on device per measurement (env hook for fast tests)
CHAIN = int(os.environ.get("BENCH_CHAIN", "32"))

# Wall-clock envelope (seconds), all env-overridable. Defaults size for
# the measured cold costs on this stack: one full-model remote compile
# is 3-5 min (CLAUDE.md), the int8 path needs two (bf16 calibration +
# quantized). The parent keeps total runtime under BENCH_BUDGET_S so
# the driver's external timeout can never produce a null record while
# the bf16 program is compilable at all.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1260"))
BF16_DEADLINE_S = float(os.environ.get("BENCH_BF16_DEADLINE_S", "660"))
# warm int8 measured 544 s end-to-end on this stack (backend init +
# calibration jit + quantized jit; each remote-cache HIT still takes
# minutes to materialize) — 700 gives ~2.5 min headroom while staying
# inside BUDGET_S after a warm bf16 phase
INT8_DEADLINE_S = float(os.environ.get("BENCH_INT8_DEADLINE_S", "700"))
_CHILD_MARK = "BENCH_CHILD_RESULT "


def bench_forward(batch_size: int, height: int = 512, width: int = 1024,
                  reps: int = 3, int8: bool = False) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables,
    )
    from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, height, width, 3))
    if int8:
        # opt-in int8 PTQ path: the measured-best 'head_ch' preset
        # quantizes the MXU-bound main-head 3x3 plus the two
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
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    import jax
    import jax.numpy as jnp
    import numpy as np

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


def _child_main(mode: str) -> None:
    """Run ONE measurement and print a marked JSON line.

    Executed in a subprocess so the parent can enforce a wall-clock
    deadline with kill-by-PID (fresh remote compiles on this stack can
    hang indefinitely and ignore SIGTERM). Exactly one TPU process runs
    at a time: the parent never initializes jax.
    """
    if os.environ.get("BENCH_FAKE_HANG") in (mode, "all"):
        # test hook: simulate the compile-service stall (hang before any
        # backend work so the parent's deadline is the only way out).
        time.sleep(10 ** 6)
    import jax

    backend = jax.default_backend()
    # batch 128 measured best on v5e: 16/32 ~40% lower, 64 = 1944,
    # 128 = 2664, 144 = 1987, 160 = 1981 (the HBM cliff is a step
    # function right after 128), 256 worse still.
    bs = int(os.environ.get("BENCH_BS",
                            "128" if backend == "tpu" else "2"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))
    width = int(os.environ.get("BENCH_WIDTH", "1024"))
    fps = bench_forward(bs, height=height, width=width,
                        int8=(mode == "int8"))
    print(f"{mode} bs={bs}: {fps:.1f} img/s", file=sys.stderr)
    out = {"fps": fps, "batch_size": bs, "backend": backend, "mode": mode}
    # Emit the primary result IMMEDIATELY: the opt-in secondary metrics
    # below compile further full-model programs and can blow the child's
    # deadline — the parent parses the LAST mark line from whatever
    # stdout the (possibly killed) child produced, so the forward record
    # survives a slow/killed secondary phase.
    print(_CHILD_MARK + json.dumps(out), flush=True)
    if os.environ.get("BENCH_FAKE_HANG_AFTER") == mode:
        time.sleep(10 ** 6)  # test hook: stall AFTER the mark line
    # Secondary metrics ride the bf16 child (opt-in, manual runs only).
    # A fresh mark line after EACH one: if the NEXT phase hangs and the
    # parent kills the child, every completed measurement survives.
    if mode == "bf16" and backend == "tpu":
        if os.environ.get("BENCH_TRAIN") == "1":
            try:
                out["train_fps"] = bench_train_step()
                print(_CHILD_MARK + json.dumps(out), flush=True)
            except Exception:
                traceback.print_exc(file=sys.stderr)
        if os.environ.get("BENCH_DA") == "1":
            try:
                out["da_fps"] = bench_da_step()
                print(_CHILD_MARK + json.dumps(out), flush=True)
            except Exception:
                traceback.print_exc(file=sys.stderr)


def _run_child(mode: str, timeout_s: float):
    """Spawn ``python bench.py`` in child mode; SIGKILL by PID on expiry.

    Returns the child's parsed result dict, or None on timeout/failure.
    """
    env = dict(os.environ)
    env["BENCH_CHILD_MODE"] = mode
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=sys.stderr,
                            cwd=os.path.dirname(os.path.abspath(__file__)))
    out = b""
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()   # SIGKILL to this PID only (never pattern-kill)
        try:
            # the post-kill drain returns whatever the child already
            # wrote — a mark line printed before a slow/killed phase
            # (e.g. the opt-in secondary metrics) is still recovered
            out, _ = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        print(f"bench child '{mode}' exceeded {timeout_s:.0f}s deadline; "
              "killed", file=sys.stderr)
    for line in reversed(out.decode(errors="replace").splitlines()):
        if line.startswith(_CHILD_MARK):
            try:
                return json.loads(line[len(_CHILD_MARK):])
            except json.JSONDecodeError:
                continue  # e.g. a final line truncated by the SIGKILL —
                # an earlier complete mark line is still a valid record
    print(f"bench child '{mode}' exited rc={proc.returncode} without a "
          "result", file=sys.stderr)
    return None


def main():
    t0 = time.monotonic()

    def remaining():
        return BUDGET_S - (time.monotonic() - t0)

    # Phase 1: bf16 — a single program, warm in the remote compile cache
    # after any prior run this round. One retry: after killing a wedged
    # claim the NEXT claim blocks ~3 min while the stale grant expires,
    # then runs fine (CLAUDE.md wedge playbook).
    bf16 = _run_child("bf16", min(BF16_DEADLINE_S, max(remaining(), 60)))
    if bf16 is None and remaining() > 300:
        print("retrying bf16 child once (stale-grant window)",
              file=sys.stderr)
        bf16 = _run_child("bf16", max(remaining() - 30, 60))

    # Phase 2: int8 upgrade (measured +5% via the head_ch preset,
    # parity-qualified in tests/test_eval_parity.py) — only with budget
    # to spare, and never at the cost of the bf16 record. BENCH_BF16=1
    # skips it; BENCH_FORCE_INT8=1 attempts it even off-TPU (tests).
    int8 = None
    on_tpu = bf16 is not None and bf16.get("backend") == "tpu"
    want_int8 = ((on_tpu or os.environ.get("BENCH_FORCE_INT8") == "1")
                 and os.environ.get("BENCH_BF16") != "1")
    if want_int8 and remaining() > 120:
        int8 = _run_child("int8", min(INT8_DEADLINE_S,
                                      max(remaining() - 30, 60)))

    candidates = [r for r in (bf16, int8) if r and r.get("fps", 0) > 0]
    if not candidates:
        # Still emit a parseable record: an explicit infra-failure line
        # beats the driver's timeout producing nothing (BENCH_r04).
        print(json.dumps({
            "metric":
                "images_per_sec_per_chip_bisenet_stdc813_1024x512_infer",
            "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
            "error": "all measurement children timed out or failed "
                     "(remote compile service outage; see stderr)",
        }))
        return
    best = max(candidates, key=lambda r: r["fps"])
    result = {
        "metric": "images_per_sec_per_chip_bisenet_stdc813_1024x512_infer",
        "value": round(best["fps"], 2),
        "unit": "images/sec",
        "vs_baseline": round(best["fps"] / BASELINE_FPS, 3),
        "batch_size": best["batch_size"],
        "backend": best["backend"],
        "dtype": "int8+bfloat16" if best["mode"] == "int8" else "bfloat16",
    }
    if bf16 and bf16.get("train_fps"):
        result["train_images_per_sec"] = round(bf16["train_fps"], 2)
    if bf16 and bf16.get("da_fps"):
        result["da_source_images_per_sec"] = round(bf16["da_fps"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    mode = os.environ.get("BENCH_CHILD_MODE")
    if mode:
        _child_main(mode)
    else:
        main()
