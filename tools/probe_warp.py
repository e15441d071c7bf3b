"""Warp-gather formulations on the real chip (the H-RP augmentation cost).

bench_aug measured the H-RP menu at 11.9 ms/img (chip, bs=128) — 200x the
CS-HF color menu. The cost is the bilinear warp's flat gather: 512*1024
rows of 4taps*3ch bf16 (24 B) per image, ~22 cycles/row on v5e. This
probe times the same warp numerics under different gather layouts to find
what the hardware actually charges for:

  bil/bf16   : production _gather_bilinear (4-tap stack, bf16 rows)
  bil/u8     : identical indices, uint8 table (pixels are integer-valued
               at warp time — the color ops emit truncated uint8-valued
               floats — so the cast is LOSSLESS), 12 B rows
  bil/f32    : fp32 table, 48 B rows (row-size scaling probe)
  near/bf16  : 1-tap nearest gather (the B-GS-R rotation shape)

If rows/s is constant across dtypes the gather is per-row latency-bound
(pack more per row); if B/s is constant it is bandwidth-bound.

MEASURED (v5e, 2026-08-21, bs=128 1024x512, isolated warp):

  bil_bf16  11604 us/img  45.2 Mrows/s   (matches bench_aug's 11938
  bil_u8    10488 us/img  50.0 Mrows/s    end-to-end H-RP: the grid
  near_bf16  8583 us/img  61.1 Mrows/s    math is negligible)
  near_u8    7873 us/img  66.6 Mrows/s

Verdict: PER-ROW-LATENCY-BOUND, ~14-20 cycles/row regardless of row
bytes (24B->3B barely moves it) — uint8 tables are only +10%, and even
the 1-tap nearest gather (the B-GS-R rotation shape) pays 8.6 ms/img.
The only lever is ROW-COUNT reduction:
  * rotation (affine, nearest): a 3-shear decomposition makes every pass
    a per-row-CONSTANT shift = H whole-row gathers instead of H*W pixel
    gathers (~1536 rows/img, est ~0.1 ms/img, ~86x) — but composed
    integer rounding differs from PIL's direct inverse map by +-1 px on
    rounding-boundary pixels, so it cannot serve the pil-exact replay
    paths; it would be a training-path-only mode with a measured
    displacement envelope. PARKED: design is sound, parity-envelope work
    is the cost.
  * perspective (projective, bilinear): not shear-decomposable; pixel-
    packing (k output px per gathered row) trades row count for row
    width but rotation-sized spans blow the row width up. No good
    in-XLA form; an in-kernel Mosaic gather path does not exist.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_warp.py
       [WARP_VARIANTS=bil_u8,near_bf16 ...] one jit program per variant,
       results flush incrementally (survive a timeout kill).
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.data.augment import (
    _source_coords, perspective_coeffs, sample_perspective_endpoints)

H = int(os.environ.get("WARP_H", 512))
W = int(os.environ.get("WARP_W", 1024))
B = int(os.environ.get("WARP_B", 128))
CHAIN = int(os.environ.get("WARP_CHAIN", 16))
REPS = 3


def _grids(imgs, key):
    """Per-sample perspective source grids (the H-RP draw)."""
    def one(img, k):
        start, end = sample_perspective_endpoints(k, H, W, 0.5)
        coeffs = perspective_coeffs(start, end)
        sx, sy = _source_coords(H, W, coeffs)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = jnp.where(x0 < 0, 0.0, sx - x0)
        wy = jnp.where(y0 < 0, 0.0, sy - y0)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        return x0i, y0i, wx, wy
    return jax.vmap(one)(imgs, jax.random.split(key, imgs.shape[0]))


def _stack4(img, dtype):
    f = img.astype(dtype)
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    down = jnp.concatenate([f[1:], f[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([f, right, down, downright], axis=-1)


def _bil(img, x0i, y0i, wx, wy, dtype, mode):
    stack = _stack4(img, dtype)
    flat = stack.reshape(H * W, 4 * 3)
    idx = (y0i * W + x0i).reshape(-1)
    # indices are pre-clipped: promise_in_bounds is safe and skips the
    # OOB handling ('clip' is what jnp.take compiles to otherwise)
    g = flat.at[idx].get(mode=mode).reshape(H, W, 4, 3)
    g = g.astype(jnp.float32)
    top = g[..., 0, :] * (1 - wx)[..., None] + g[..., 1, :] * wx[..., None]
    bot = g[..., 2, :] * (1 - wx)[..., None] + g[..., 3, :] * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _near(img, x0i, y0i, wx, wy, dtype, mode):
    f = img.astype(dtype)
    idx = (y0i * W + x0i).reshape(-1)
    g = f.reshape(H * W, 3).at[idx].get(mode=mode)
    return g.astype(jnp.float32).reshape(H, W, 3)


VARIANTS = {
    "bil_bf16": (_bil, jnp.bfloat16, "clip"),
    "bil_u8": (_bil, jnp.uint8, "clip"),
    "bil_f32": (_bil, jnp.float32, "clip"),
    "bil_bf16_pib": (_bil, jnp.bfloat16, "promise_in_bounds"),
    "near_bf16": (_near, jnp.bfloat16, "clip"),
    "near_u8": (_near, jnp.uint8, "clip"),
}


@partial(jax.jit, static_argnames=("name",))
def chained(imgs, key, name):
    fn, dtype, mode = VARIANTS[name]
    x0i, y0i, wx, wy = _grids(imgs, key)

    def body(carry, i):
        out = jax.vmap(lambda im, a, b, c, d: fn(im, a, b, c, d, dtype,
                                                 mode))(
            carry, x0i, y0i, wx, wy)
        s = out.sum() * jnp.float32(1e-30)
        return carry + s.astype(carry.dtype), s
    _, sums = jax.lax.scan(body, imgs, jnp.arange(CHAIN))
    return sums


def main():
    print(f"backend={jax.default_backend()} B={B} {H}x{W} chain={CHAIN}",
          flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 256, (B, H, W, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    names = os.environ.get(
        "WARP_VARIANTS", "bil_bf16,bil_u8,near_bf16,near_u8").split(",")
    for name in names:
        np.asarray(chained(imgs, key, name))  # compile
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(imgs, key, name))
            best = min(best, time.perf_counter() - t0)
        us = best / (B * CHAIN) * 1e6
        rows = H * W / (us / 1e6) / 1e6
        print(f"{name:13s}: {us:8.2f} us/img ({rows:7.1f} Mrows/s)",
              flush=True)


if __name__ == "__main__":
    main()
