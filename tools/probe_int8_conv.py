"""Probe: are int8 convolutions fast on this v5e stack?

v5e's MXU runs s8xs8->s32 at 2x the bf16 rate, and int8 halves HBM
traffic — both documented bottlenecks of the inference path (backbone
~42% MXU at bf16; post-128 batch cliff is HBM working-set pressure,
CLAUDE.md). If XLA lowers int8 `conv_general_dilated` well here, an
opt-in post-training-quantized inference mode is worth building.

Times bf16 vs int8 (preferred_element_type=int32) on the model's hot
conv shapes (NHWC, bs=128):
  head  3x3 256->256 @128x64   (the single biggest FLOP block, 57% MXU)
  s8a   1x1  64->128 @256x128  (stage-8 entry)
  s8b   3x3 128->64  @128x64   (stage-8 narrow chain)
  s16   3x3 256->512 s2 @128x64
  stem  3x3   3->32  s2 @512x256 (awkward 3-channel input)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 560 \
    python tools/probe_int8_conv.py [bs]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN, REPS = 24, 3

SHAPES = [
    # label, H, W, Cin, Cout, k, stride
    ("head 3x3 256->256 @128x64 ", 64, 128, 256, 256, 3, 1),
    ("s8a  1x1  64->128 @256x128", 128, 256, 64, 128, 1, 1),
    ("s8b  3x3 128->64  @128x64 ", 64, 128, 128, 64, 3, 2),
    ("s16  3x3 256->512s2@128x64", 64, 128, 256, 512, 3, 2),
    ("stem 3x3   3->32 s2@512x256", 256, 512, 3, 32, 3, 2),
]
DN = ("NHWC", "HWIO", "NHWC")


def bench_one(bs, h, w, cin, cout, k, stride, dtype, acc):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, (bs, h, w, cin)), jnp.int8)
        wgt = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)),
                          jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((bs, h, w, cin)), dtype)
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)), dtype)

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(stride, stride),
        padding="SAME", dimension_numbers=DN, preferred_element_type=acc)

    @jax.jit
    def chained(x, wgt):
        def body(carry, _):
            y = conv(carry, wgt)
            # fold y back into the carry so iterations serialize; keep
            # shapes static by reducing y to a scalar perturbation.
            s = jnp.sum(y.astype(jnp.float32))
            if dtype == jnp.int8:
                nxt = (carry ^ (s.astype(jnp.int32) & 1).astype(jnp.int8))
            else:
                nxt = carry + (s * jnp.float32(1e-30)).astype(carry.dtype)
            return nxt, s
        _, sums = jax.lax.scan(body, x, None, length=CHAIN)
        return sums

    np.asarray(chained(x, wgt))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(x, wgt))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN / bs * 1e6  # us/img


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    shapes = SHAPES
    if len(sys.argv) > 2:  # select shapes by index (compiles are minutes
        shapes = [SHAPES[int(i)] for i in sys.argv[2].split(",")]
    for label, h, w, cin, cout, k, stride in shapes:
        try:
            t_bf = bench_one(bs, h, w, cin, cout, k, stride,
                             jnp.bfloat16, jnp.float32)
        except Exception as e:  # pragma: no cover
            print(f"{label}: bf16 FAILED {type(e).__name__}: {e}")
            continue
        try:
            t_i8 = bench_one(bs, h, w, cin, cout, k, stride,
                             jnp.int8, jnp.int32)
            print(f"{label}: bf16 {t_bf:7.3f} us/img   int8 {t_i8:7.3f}"
                  f"   speedup {t_bf / t_i8:.2f}x", flush=True)
        except Exception as e:
            print(f"{label}: bf16 {t_bf:7.3f} us/img   int8 FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
