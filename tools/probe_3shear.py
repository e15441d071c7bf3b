"""Attribute the 3-shear rotation cost per pass (real chip).

The first 3-shear implementation (vmapped dynamic_slice per row) hit
8252 us/img in bench_aug — barely below the direct gather's 8486 and
far from the whole-row-gather estimate. This probe timed each pass in
isolation and drove the redesign:

MEASURED (v5e, 2026-08-21, bs=128 512x1024 bf16, us/img):
  vmapped dynamic_slice:  rows 1321   cols 2562   cols_t 2565
                          full 5577   full_t 5600
    -> ~2.5 us PER GATHERED SLICE regardless of axis or transposes;
       the 'slice gather' path on this stack is ~150x off the
       per-row-latency floor probe_warp measured for flat takes.
  binary-shift (static shifts + per-row selects, NO gather):
                          rows 374    cols 701    full 2063
    -> adopted into production augment.py; with the uint8
       rotate-first ordering the end-to-end B-GS-R fast menu is
       1074 us/img (bench_aug), 7.9x the direct gather.

Variants here: rows/cols/cols_t/full_t keep the ORIGINAL slice-gather
formulation (local copies); rows_bin/cols_bin/full_bin are the binary
form; 'full' is production rotate_nearest_3shear (now binary).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_3shear.py
       [PROBE_VARIANTS=rows,cols ...] results flush incrementally.
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.data.augment import (
    rotate_nearest_3shear)


# The ORIGINAL vmapped-dynamic_slice formulation, kept here for
# comparison: production augment.py switched to the binary-shift form
# after this probe measured ~2.5 us per gathered slice (see MEASURED).
def _shift_rows_nearest(img, shifts, pad, fill):
    h, w, ch = img.shape
    padded = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)),
                     constant_values=fill)
    s = jnp.clip(shifts, -pad, pad)

    def row(r, sh):
        return jax.lax.dynamic_slice(r, (pad - sh, 0), (w, ch))

    return jax.vmap(row)(padded, s)


def _shift_cols_nearest(img, shifts, pad, fill):
    h, w, ch = img.shape
    padded = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)),
                     constant_values=fill)
    s = jnp.clip(shifts, -pad, pad)

    def col(c, sh):
        return jax.lax.dynamic_slice(c, (pad - sh, 0), (h, ch))

    return jax.vmap(col, in_axes=(1, 0), out_axes=1)(padded, s)

H = int(os.environ.get("PROBE_H", 512))
W = int(os.environ.get("PROBE_W", 1024))
B = int(os.environ.get("PROBE_B", 128))
CHAIN = int(os.environ.get("PROBE_CHAIN", 16))
REPS = 3


def shift_cols_via_transpose(img, shifts, pad, fill):
    t = jnp.swapaxes(img, 0, 1)
    t = _shift_rows_nearest(t, shifts, pad, fill)
    return jnp.swapaxes(t, 0, 1)


def rotate_3shear_t(img, angle_deg, fill=0.0):
    """rotate_nearest_3shear with the transpose-based column pass."""
    h, w, _ch = img.shape
    rad = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = jnp.tan(rad / 2.0)
    beta = -jnp.sin(rad)
    cy = (h - 1) / 2.0
    ex = h // 2 + 2
    canvas = jnp.pad(img, ((0, 0), (ex, ex), (0, 0)),
                     constant_values=fill)
    cw = w + 2 * ex
    cx = (cw - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(cw, dtype=jnp.float32)
    s13 = jnp.round(alpha * (ys - cy)).astype(jnp.int32)
    s2 = jnp.round(beta * (xs - cx)).astype(jnp.int32)
    out = _shift_rows_nearest(canvas, s13, h // 2 + 2, fill)
    out = shift_cols_via_transpose(out, s2, h + 2, fill)
    out = _shift_rows_nearest(out, s13, h // 2 + 2, fill)
    return out[:, ex:ex + w]


def _shift_rows_binary(img, shifts, pad, fill):
    """out[y, x] = img[y, x - shifts[y]] with NO gather: pad, then
    binary-decompose t = pad - shift into static left-shifts (pure
    slicing, fuses) gated per row by an elementwise select."""
    h, w, ch = img.shape
    cur = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)),
                  constant_values=fill)
    t = pad - jnp.clip(shifts, -pad, pad)   # in [0, 2*pad]
    fillv = jnp.asarray(fill, cur.dtype)
    for k in range(int(2 * pad).bit_length()):
        step = 1 << k
        if step >= cur.shape[1]:
            shifted = jnp.full_like(cur, fillv)
        else:
            shifted = jnp.concatenate(
                [cur[:, step:],
                 jnp.full((h, step, ch), fillv, cur.dtype)], axis=1)
        bit = ((t >> k) & 1).astype(bool)
        cur = jnp.where(bit[:, None, None], shifted, cur)
    return cur[:, :w]


def _shift_cols_binary(img, shifts, pad, fill):
    h, w, ch = img.shape
    cur = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)),
                  constant_values=fill)
    t = pad - jnp.clip(shifts, -pad, pad)
    fillv = jnp.asarray(fill, cur.dtype)
    for k in range(int(2 * pad).bit_length()):
        step = 1 << k
        if step >= cur.shape[0]:
            shifted = jnp.full_like(cur, fillv)
        else:
            shifted = jnp.concatenate(
                [cur[step:],
                 jnp.full((step, w, ch), fillv, cur.dtype)], axis=0)
        bit = ((t >> k) & 1).astype(bool)
        cur = jnp.where(bit[None, :, None], shifted, cur)
    return cur[:h]


def rotate_3shear_bin(img, angle_deg, fill=0.0):
    """3-shear rotation with binary-shift passes (gather-free)."""
    h, w, _ch = img.shape
    rad = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = jnp.tan(rad / 2.0)
    beta = -jnp.sin(rad)
    cy = (h - 1) / 2.0
    ex = h // 2 + 2
    canvas = jnp.pad(img, ((0, 0), (ex, ex), (0, 0)),
                     constant_values=fill)
    cw = w + 2 * ex
    cx = (cw - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(cw, dtype=jnp.float32)
    s13 = jnp.round(alpha * (ys - cy)).astype(jnp.int32)
    s2 = jnp.round(beta * (xs - cx)).astype(jnp.int32)
    out = _shift_rows_binary(canvas, s13, h // 2 + 2, fill)
    out = _shift_cols_binary(out, s2, h + 2, fill)
    out = _shift_rows_binary(out, s13, h // 2 + 2, fill)
    return out[:, ex:ex + w]


def make_fn(variant):
    def per_sample(img, key):
        h, w, _ = img.shape
        ang = jax.random.uniform(key, (), minval=-90.0, maxval=90.0)
        if variant == "full":
            return rotate_nearest_3shear(img, ang)
        if variant == "full_t":
            return rotate_3shear_t(img, ang)
        if variant == "full_bin":
            return rotate_3shear_bin(img, ang)
        alpha = jnp.tan(jnp.deg2rad(ang) / 2.0)
        if variant in ("rows", "rows_bin"):
            s = jnp.round(alpha * (jnp.arange(h, dtype=jnp.float32)
                                   - (h - 1) / 2)).astype(jnp.int32)
            fn = (_shift_rows_binary if variant == "rows_bin"
                  else _shift_rows_nearest)
            return fn(img, s, h // 2 + 2, 0.0)
        s = jnp.round(alpha * (jnp.arange(w, dtype=jnp.float32)
                               - (w - 1) / 2)).astype(jnp.int32)
        s = jnp.clip(s, -(h + 1), h + 1)
        if variant == "cols":
            return _shift_cols_nearest(img, s, h + 2, 0.0)
        if variant == "cols_t":
            return shift_cols_via_transpose(img, s, h + 2, 0.0)
        if variant == "cols_bin":
            return _shift_cols_binary(img, s, h + 2, 0.0)
        raise KeyError(variant)

    @jax.jit
    def chained(imgs, key):
        def body(carry, i):
            ks = jax.random.split(jax.random.fold_in(key, i), B)
            out = jax.vmap(per_sample)(carry, ks)
            s = out.astype(jnp.float32).sum() * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), s
        _, sums = jax.lax.scan(body, imgs, jnp.arange(CHAIN))
        return sums

    return chained


def main():
    print(f"backend={jax.default_backend()} B={B} {H}x{W} chain={CHAIN}",
          flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3)), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variants = os.environ.get(
        "PROBE_VARIANTS", "rows,cols,cols_t,full,full_t").split(",")
    for v in variants:
        fn = make_fn(v)
        np.asarray(fn(imgs, key))  # compile
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(fn(imgs, key))
            best = min(best, time.perf_counter() - t0)
        us = best / (B * CHAIN) * 1e6
        print(f"{v:8s}: {us:9.2f} us/img ({1e6 / us:.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
