"""Device-side augmentation cost: prepare_batch with each aug menu (real chip).

The three reference augmentation families (reference GTAV.py:32-59) run
ON DEVICE here, inside data/pipeline.py::prepare_batch (uint8 -> augment ->
normalize -> bf16).  This probe measures what each menu adds over the plain
normalize path at the production batch/geometry, so the cost of the
round-4 PIL-exact kernels (color ops, fixed-point rotation, perspective
warp) is a recorded number instead of a guess:

  * aug=None        : u8->f32, /255, ImageNet normalize, bf16 cast (+ LUT
                      remap -- the GTA5 source pipeline always remaps)
  * CS-HF / H-RP / B-GS-R : the same plus the menu's color + geometry ops
  * faithful (image-only) AND corrected (labels warped too) modes

Protocol: bench.py's on-device lax.scan chain (a forged ~0 data dependency
between iterations, one host readback) -- robust to the tunnel's early
block_until_ready returns.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_aug.py
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.data.pipeline import prepare_batch

H = int(os.environ.get("AUG_H", 512))
W = int(os.environ.get("AUG_W", 1024))
B = int(os.environ.get("AUG_B", 128))
CHAIN = int(os.environ.get("AUG_CHAIN", 32))
REPS = 3


@partial(jax.jit, static_argnames=("aug", "aug_labels", "fast"))
def chained(images_u8, labels_u8, key, aug, aug_labels, fast=False):
    def body(carry, i):
        k = jax.random.fold_in(key, i)
        imgs, labels = prepare_batch(carry, labels_u8, key=k, aug_type=aug,
                                     augment_labels=aug_labels, remap=True,
                                     dtype=jnp.bfloat16,
                                     fast_geometry=fast)
        # forge a data dependency so iterations serialize and nothing is
        # dead-code-eliminated; s is ~1e-30 * sum -> uint8 0, but XLA
        # cannot fold it (depends on the iteration's output).
        s = (imgs.astype(jnp.float32).sum() * jnp.float32(1e-30)
             + labels.sum().astype(jnp.float32) * jnp.float32(1e-30))
        return carry + s.astype(carry.dtype), s
    _, sums = jax.lax.scan(body, images_u8, jnp.arange(CHAIN))
    return sums


def bench(images, labels, key, aug, aug_labels, fast=False):
    np.asarray(chained(images, labels, key, aug, aug_labels, fast))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(images, labels, key, aug, aug_labels, fast))
        best = min(best, time.perf_counter() - t0)
    return best / (B * CHAIN) * 1e6  # us/img


def main():
    print(f"backend={jax.default_backend()} B={B} {H}x{W} chain={CHAIN}",
          flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 35, (B, H, W)), jnp.uint8)
    key = jax.random.PRNGKey(0)

    # AUG_CONFIGS: comma list of None | <menu>:faithful | <menu>:corrected
    # (one jit program per entry — run them one per PROCESS when the
    # remote compile service is flaky; multi-program runs rarely fit a
    # healthy window).
    default = ("None,CS-HF:faithful,H-RP:faithful,B-GS-R:faithful,"
               "CS-HF:corrected,H-RP:corrected,B-GS-R:corrected")
    base = None
    for spec in os.environ.get("AUG_CONFIGS", default).split(","):
        if spec == "None":
            base = bench(images, labels, key, None, False)
            print(f"aug=None            : {base:8.2f} us/img "
                  f"({1e6 / base:.0f} img/s)", flush=True)
            continue
        # tags: faithful | corrected | fast | fastcorr (fast* = 3-shear
        # rotation, --fast_device_geometry; B-GS-R only)
        aug, tag = spec.split(":")
        us = bench(images, labels, key, aug, "corr" in tag,
                   fast=tag.startswith("fast"))
        over = f"(+{us - base:7.2f} over None; " if base is not None else "("
        print(f"aug={aug:7s}{tag:10s}: {us:8.2f} us/img "
              f"{over}{1e6 / us:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
