"""Probe: would REGION-based int8 (activations staying s8 between convs)
beat the current per-layer design?

Current ops/quantize.py wraps each conv+BN+ReLU independently: bf16 in
-> quantize s8 -> s8xs8->s32 conv -> dequant+BN+ReLU -> bf16 out. At
every boundary between two quantized layers the producer's bf16 output
AND the consumer's s8 copy both hit HBM — the measured reason the 'all'
preset is a 10% end-to-end REGRESSION (tools/bench_int8.py) even though
the convs themselves win (probe_int8_conv.py: 1.3-1.7x).

A region design would requantize s32 conv output directly to s8
(per-channel scale + ReLU + clamp, no bf16 materialization) so chains of
quantized convs keep activations int8 in HBM — halving activation
traffic exactly where the model is HBM-bound. This probe measures the
best case on a realistic stage-8 chain (1x1 64->128 @256x128 then 3x3
128->64, NHWC, bs=128):

  A bf16      conv -> scale+relu -> conv                (today's path)
  B per-layer bf16->s8 conv s32->bf16 | bf16->s8 conv   (today's int8)
  C region    s8 conv s32 ->(requant s8)-> conv -> bf16 (proposed)

Measured (v5e, bs=128, 2026-08-18):
  A bf16 40.5 us/img   B per-layer 44.7 (0.91x — reproduces the 'all'
  preset regression mechanism)   C region 36.1 (1.12x vs A, 1.24x vs B)
  VERDICT: parked. Even the ideal unbranched-chain region win is only
  12% over bf16, and real stage-8 Cat blocks would spend it at every
  concat/skip region exit — well under the 2% end-to-end wiring bar.
Caveat either way: stage-8 Cat blocks concat 4 branch outputs that the
skip path also consumes in bf16, so region exits at every concat
re-introduce the dual materialization — a model-level win needs the
whole stage (concat + pooling) kept s8, not just conv chains.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
    python tools/probe_int8_region.py [bs]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN, REPS = 24, 3
H, W, C0, C1, C2 = 128, 256, 64, 128, 64
DN = ("NHWC", "HWIO", "NHWC")

conv = functools.partial(jax.lax.conv_general_dilated, padding="SAME",
                         dimension_numbers=DN)


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            y = fn(carry, *a[1:])
            s = jnp.sum(y.astype(jnp.float32))
            if carry.dtype == jnp.int8:
                nxt = carry ^ (s.astype(jnp.int32) & 1).astype(jnp.int8)
            else:
                nxt = carry + (s * jnp.float32(1e-30)).astype(carry.dtype)
            return nxt, s
        _, sums = jax.lax.scan(body, a[0], None, length=CHAIN)
        return sums

    np.asarray(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN / args[0].shape[0] * 1e6  # us/img


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((bs, H, W, C0)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (bs, H, W, C0)), jnp.int8)
    w1_16 = jnp.asarray(rng.standard_normal((1, 1, C0, C1)), jnp.bfloat16)
    w2_16 = jnp.asarray(rng.standard_normal((3, 3, C1, C2)), jnp.bfloat16)
    w1_8 = jnp.asarray(rng.integers(-127, 128, (1, 1, C0, C1)), jnp.int8)
    w2_8 = jnp.asarray(rng.integers(-127, 128, (3, 3, C1, C2)), jnp.int8)
    sc1 = jnp.asarray(rng.standard_normal((C1,)) * 0.01 + 0.02, jnp.float32)
    sc2 = jnp.asarray(rng.standard_normal((C2,)) * 0.01 + 0.02, jnp.float32)

    def chain_bf16(x, w1, w2, s1, s2):
        y = conv(x, w1, window_strides=(1, 1),
                 preferred_element_type=jnp.float32)
        y = jnp.maximum(y * s1, 0.0).astype(jnp.bfloat16)
        z = conv(y, w2, window_strides=(2, 2),
                 preferred_element_type=jnp.float32)
        return jnp.maximum(z * s2, 0.0).astype(jnp.bfloat16)

    def chain_perlayer(x, w1, w2, s1, s2):
        # today's QuantConvBNReLU semantics: bf16 boundary between layers
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * 32.0),
                     -127, 127).astype(jnp.int8)
        y = conv(q, w1, window_strides=(1, 1),
                 preferred_element_type=jnp.int32)
        y16 = jnp.maximum(y.astype(jnp.float32) * s1, 0.0
                          ).astype(jnp.bfloat16)          # bf16 materializes
        q2 = jnp.clip(jnp.round(y16.astype(jnp.float32) * 16.0),
                      -127, 127).astype(jnp.int8)          # s8 copy too
        z = conv(q2, w2, window_strides=(2, 2),
                 preferred_element_type=jnp.int32)
        return jnp.maximum(z.astype(jnp.float32) * s2, 0.0
                           ).astype(jnp.bfloat16)

    def chain_region(x, w1, w2, s1, s2):
        # proposed: s32 -> relu -> requant s8, no bf16 intermediate
        y = conv(x, w1, window_strides=(1, 1),
                 preferred_element_type=jnp.int32)
        y8 = jnp.clip(jnp.round(jnp.maximum(y.astype(jnp.float32) * s1,
                                            0.0) * 16.0),
                      0, 127).astype(jnp.int8)
        z = conv(y8, w2, window_strides=(2, 2),
                 preferred_element_type=jnp.int32)
        return jnp.maximum(z.astype(jnp.float32) * s2, 0.0
                           ).astype(jnp.bfloat16)

    a = timed(chain_bf16, x16, w1_16, w2_16, sc1, sc2)
    print(f"A bf16 chain      : {a:7.3f} us/img", flush=True)
    b = timed(chain_perlayer, x16, w1_8, w2_8, sc1, sc2)
    print(f"B per-layer int8  : {b:7.3f} us/img  ({a / b:.2f}x vs A)",
          flush=True)
    c = timed(chain_region, x8, w1_8, w2_8, sc1, sc2)
    print(f"C region int8     : {c:7.3f} us/img  ({a / c:.2f}x vs A, "
          f"{b / c:.2f}x vs B)", flush=True)


if __name__ == "__main__":
    main()
