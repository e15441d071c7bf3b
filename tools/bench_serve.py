"""Chip validation + throughput for exported serving artifacts.

Exports two artifacts in-process (portable XLA and tpu-only fused,
utils/export.py), executes both on the chip, checks exact agreement
with the live model, and times the fused one with the bench.py
protocol (lax.scan-chained on-device iterations, single host readback).

Expectation: the fused artifact matches bench.py's live fused path
(same XLA program modulo the baked preprocessing); the portable one
runs the tap-matmul resize+argmax (bench.py's pre-kernel path,
~2376 img/s at bs=128).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1100 \
    python tools/bench_serve.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN, REPS = 32, 3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h, w = 512, 1024
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables)
    from dasemanticsegmentationaml_tpu.utils.export import (
        export_inference, make_serving_fn)

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, h, w, 3))
    rng = np.random.default_rng(0)
    imgs_small = jnp.asarray(rng.integers(0, 256, (2, h, w, 3)), jnp.uint8)

    # warm the dispatch path with a throwaway op
    np.asarray(jnp.ones((8, 128), jnp.bfloat16) @ jnp.ones((128, 8),
                                                           jnp.bfloat16))

    exp_fused = export_inference(model, v, h, w, use_fused_kernel=True)
    exp_plain = export_inference(model, v, h, w, platforms=("cpu", "tpu"))
    live = jax.jit(make_serving_fn(model, v, use_fused_kernel=True))

    want = np.asarray(live(imgs_small))
    got_f = np.asarray(jax.jit(exp_fused.call)(imgs_small))
    got_p = np.asarray(jax.jit(exp_plain.call)(imgs_small))
    print("fused artifact exact vs live:", bool((got_f == want).all()))
    agree = float((got_p == want).mean())
    print(f"portable artifact argmax agreement vs fused: {agree:.6f} "
          "(bf16 tap quantization, expect ~1-5e-6 mismatch)")

    imgs = jnp.asarray(rng.integers(0, 256, (bs, h, w, 3)), jnp.uint8)

    for name, exp in (("fused", exp_fused), ("portable", exp_plain)):
        @jax.jit
        def chained(images):
            def body(carry, _):
                pred = exp.call(carry)  # noqa: B023
                bump = (jnp.sum(pred) % 2).astype(jnp.uint8)
                return carry + bump[None, None, None, None], jnp.sum(pred)
            _, sums = jax.lax.scan(body, images, None, length=CHAIN)
            return sums

        np.asarray(chained(imgs))  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(imgs))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: bs={bs} {bs * CHAIN / best:.1f} img/s "
              "(incl. baked uint8 preprocessing)")


if __name__ == "__main__":
    main()
