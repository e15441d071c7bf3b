"""Pin the driver-facing surface: ``__graft_entry__.entry()`` and the
bench.py measurement functions.

The round driver compile-checks ``entry()`` single-chip and runs bench.py
on the real chip; ``dryrun_multichip`` is covered in test_parallel. A
silent import/signature break in either file costs the round its
benchmark and compile checks without failing any package test, so this
module exercises them directly (tiny shapes, CPU).
"""

import json
import os
import subprocess
import sys
import time

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_returns_jittable_forward():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # Trace-and-lower proves jittability (static shapes, no data-dependent
    # python control flow) without paying a full 512x1024 CPU execution.
    jax.jit(fn).lower(*args)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 512, 1024, 19)  # NHWC full-res logits


@pytest.mark.parametrize("which", ["forward", "train", "da"])
def test_bench_functions_smoke(monkeypatch, which):
    import bench

    monkeypatch.setattr(bench, "CHAIN", 2)
    if which == "forward":
        fps = bench.bench_forward(1, height=64, width=128, reps=1)
    elif which == "train":
        fps = bench.bench_train_step(batch_size=1, height=64, width=128,
                                     iters=1)
    else:
        fps = bench.bench_da_step(batch_size=1, height=64, width=128,
                                  iters=1)
    assert fps > 0


def _bench_env(**extra):
    """Subprocess env: forced-CPU platform, tiny shapes, short chain."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_BS"] = "1"
    env["BENCH_HEIGHT"] = "64"
    env["BENCH_WIDTH"] = "128"
    env["BENCH_CHAIN"] = "2"
    env.update(extra)
    return env


def _run_bench(env, timeout=600):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        env=env, cwd=REPO_ROOT, capture_output=True, timeout=timeout)
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    # the driver parses stdout as ONE JSON line — pin that invariant
    assert len(lines) == 1, lines
    return json.loads(lines[0])


def test_bench_survives_int8_compile_stall():
    """Round-4 regression (VERDICT missing #1): a hang in the int8
    branch (the documented compile-service failure mode) must not cost
    the round its bench record. BENCH_FAKE_HANG simulates the stall; the
    parent must kill the child at its deadline and print the completed
    bf16 result."""
    env = _bench_env(BENCH_FAKE_HANG="int8", BENCH_FORCE_INT8="1",
                     BENCH_BUDGET_S="480", BENCH_INT8_DEADLINE_S="10")
    t0 = time.monotonic()
    rec = _run_bench(env)
    elapsed = time.monotonic() - t0
    assert rec["value"] > 0
    assert rec["dtype"] == "bfloat16"
    assert rec["backend"] == "cpu"
    # bf16 measurement time + the 10s int8 deadline + margin; the old
    # code would have sat in the hang until the driver's kill (rc=124).
    assert elapsed < 300, elapsed


def test_bench_recovers_mark_from_killed_child():
    """Review finding: a child killed AFTER measuring (e.g. a slow
    opt-in secondary phase) must not lose its already-printed result —
    the parent drains the killed child's stdout and takes the last mark
    line."""
    env = _bench_env(BENCH_FAKE_HANG_AFTER="bf16", BENCH_BUDGET_S="480",
                     BENCH_BF16_DEADLINE_S="150")
    rec = _run_bench(env, timeout=600)
    assert rec["value"] > 0
    assert rec["dtype"] == "bfloat16"


def test_bench_total_outage_still_prints_record():
    """If every measurement child stalls, bench.py must still emit a
    parseable record (explicit infra-failure, value 0) within its own
    budget instead of nothing."""
    env = _bench_env(BENCH_FAKE_HANG="all", BENCH_BUDGET_S="8",
                     BENCH_BF16_DEADLINE_S="3", BENCH_INT8_DEADLINE_S="3")
    rec = _run_bench(env, timeout=120)
    assert rec["value"] == 0.0
    assert "error" in rec


def test_console_entry_points_resolve():
    """pyproject.toml's console scripts must point at real callables that
    swallow main()'s metrics-dict return (setuptools would misread a dict
    as a nonzero exit status)."""
    import tomllib

    import dasemanticsegmentationaml_tpu.cli as cli
    import dasemanticsegmentationaml_tpu.serve as serve

    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    for target in scripts.values():
        mod, func = target.split(":")
        assert mod in ("dasemanticsegmentationaml_tpu.cli",
                       "dasemanticsegmentationaml_tpu.serve")
        obj = {"dasemanticsegmentationaml_tpu.cli": cli,
               "dasemanticsegmentationaml_tpu.serve": serve}[mod]
        assert callable(getattr(obj, func))
