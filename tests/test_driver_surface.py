"""Pin the driver-facing surface: ``__graft_entry__.entry()`` and the
bench.py measurement functions.

The round driver compile-checks ``entry()`` single-chip and runs bench.py
on the real chip; ``dryrun_multichip`` is covered in test_parallel. A
silent import/signature break in either file costs the round its
benchmark and compile checks without failing any package test, so this
module exercises them directly (tiny shapes, CPU).
"""

import jax
import pytest


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
