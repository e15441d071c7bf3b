"""Probe: can an above-XLA reformulation beat conv backward on the
narrow STDC convs?

The train step floor (CLAUDE.md, tools/ablate_bwd.py) is conv backward
at ~19% MXU, spread across every narrow conv in the backbone — and the
stage-8 isolation showed wgrad dominates while dgrad is cheap. XLA picks
its own conv-wgrad lowering; this probe measures whether formulating the
SAME convolution differently changes what the compiler does with the
backward, at the real stage-8 shapes (bs=128, 1/8 res = 64x128):

  native   lax.conv_general_dilated, autodiff backward (today's path)
  shift9   forward as 9 statically-shifted [NHW,Cin]x[Cin,Cout] dots on
           a pre-padded input; autodiff turns each into a wgrad dot
           with K=N*H*W contraction and a dgrad dot + pad-transpose
  customvjp forward native conv; dx native (flipped-kernel conv);
           dW as 9 slice-einsums 'nhwc,nhwo->co' (fp32 accum, bf16 out)
  patches  conv_general_dilated_patches -> [NHW, 9Cin] @ [9Cin, Cout]
           (materializes the patch matrix; autodiff backward)

Per shape we time grad-wrt-weights ONLY (the dominant piece) and the
full fwd+dx+dW, CHAIN-scanned on device per the repo timing protocol.

Measured (v5e, bs=128, 2026-08-19, ms/img; concurrent pytest on the
1-core host skews absolute dispatch a little, relative order is clear):
  shape                 native        shift9       customvjp     patches
  3x3 128->64  wgrad    0.0255        0.0438       0.0441        0.2455
               full     0.0322        0.1044       0.0506        0.5446
  3x3  64->32  wgrad    0.0182        0.0276       0.0280        0.0502
               full     0.0207        0.0630       0.0300        0.2015
  3x3  32->32  wgrad    0.0151        0.0151       0.0154        0.0233
               full     0.0165        0.0327       0.0164        0.0999
  1x1 256->128 wgrad    0.0309        0.0306(dot)  0.0307        —
               full     0.0358        0.0358(dot)  0.0357        —
  3x3 256->256 wgrad    0.0751        0.0802       0.0793        0.3894
   (control)  full      0.1246        0.2014       0.1297        0.9862
VERDICT: parked — XLA's native conv backward WINS every 3x3 shape.
The 9-slice-dot wgrad is 1.7x slower at 128->64, 1.5x at 64->32, and
only ties at 32x32 (where both are dispatch-floor-bound); patches lose
3-10x (patch materialization is pure HBM overhead) and shift9's
autodiff backward pays 9 separate pad-transposed dgrads. Expressing a
1x1 conv as a plain einsum is EXACTLY native speed (XLA already lowers
it as a dot). Conclusion: the ~19% MXU train floor is the
narrow-channel contraction physics (Cin*9 or Cout below the 128-lane
tile), not a lowering artifact reachable from above XLA — consistent
with the fused_stdc park; no wiring change follows from this probe.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1700 \
    python tools/probe_conv_bwd_formulations.py [bs]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN, REPS = 16, 3
DN = ("NHWC", "HWIO", "NHWC")
f32 = jnp.float32


def conv_native(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=DN)


def conv_shift9(x, w):
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2,) * 2, (kw // 2,) * 2, (0, 0)))
    out = jnp.zeros((n, h, ww, cout), f32)
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, ww, cin))
            out = out + jnp.einsum("nhwc,co->nhwo", sl, w[dy, dx],
                                   preferred_element_type=f32)
    return out.astype(x.dtype)


def conv_dot1x1(x, w):
    return jnp.einsum("nhwc,co->nhwo", x, w[0, 0],
                      preferred_element_type=f32).astype(x.dtype)


def conv_patches(x, w):
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    pat = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), "SAME", dimension_numbers=DN)
    # patches order: feature dim = Cin*KH*KW (channel-major)
    return jnp.einsum("nhwk,ko->nhwo", pat,
                      w.transpose(2, 0, 1, 3).reshape(cin * kh * kw, cout),
                      preferred_element_type=f32).astype(x.dtype)


@jax.custom_vjp
def conv_customvjp(x, w):
    return conv_native(x, w)


def _cv_fwd(x, w):
    return conv_native(x, w), (x, w)


def _cv_bwd(res, g):
    x, w = res
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    # dx: native conv of g with spatially-flipped, io-swapped kernel
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(g, wt, (1, 1), "SAME",
                                      dimension_numbers=DN)
    # dW: 9 slice-dots, K = N*H*W contraction
    xp = jnp.pad(x, ((0, 0), (kh // 2,) * 2, (kw // 2,) * 2, (0, 0)))
    taps = []
    for dy in range(kh):
        for dx_ in range(kw):
            sl = jax.lax.dynamic_slice(xp, (0, dy, dx_, 0),
                                       (n, h, ww, cin))
            taps.append(jnp.einsum("nhwc,nhwo->co", sl, g,
                                   preferred_element_type=f32))
    dw = jnp.stack(taps).reshape(kh, kw, cin, cout).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv_customvjp.defvjp(_cv_fwd, _cv_bwd)


def bench(fn, x, w, bs, label, wgrad_only):
    if wgrad_only:
        def loss(w, x):
            return jnp.sum(fn(x, w).astype(f32)) * f32(1e-9)

        def step(x, w):
            g = jax.grad(loss)(w, x)
            return jnp.sum(g.astype(f32)) * f32(1e-9)
    else:
        def loss(args, _):
            x, w = args
            return jnp.sum(fn(x, w).astype(f32)) * f32(1e-9)

        def step(x, w):
            _, (gx, gw) = jax.value_and_grad(lambda a: loss(a, None))((x, w))
            return (jnp.sum(gx.astype(f32)) + jnp.sum(gw.astype(f32))) \
                * f32(1e-9)

    @jax.jit
    def chained(x, w):
        def body(carry, _):
            out = step(carry, w)
            return carry + (out * f32(1e-30)).astype(carry.dtype), out
        _, outs = jax.lax.scan(body, x, None, length=CHAIN)
        return outs

    np.asarray(chained(x, w))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(x, w))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN / bs * 1e3
    mode = "wgrad" if wgrad_only else "full "
    print(f"{label} {mode}: {ms:.4f} ms/img", flush=True)
    return ms


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    shapes = [
        ("3x3 128->64 @1/8", (64, 128, 128), (3, 3, 128, 64)),
        ("3x3  64->32 @1/8", (64, 128, 64), (3, 3, 64, 32)),
        ("3x3  32->32 @1/8", (64, 128, 32), (3, 3, 32, 32)),
        ("1x1 256->128 @1/8", (64, 128, 256), (1, 1, 256, 128)),
        ("3x3 256->256 @1/8 (ctl)", (64, 128, 256), (3, 3, 256, 256)),
    ]
    forms = [("native", conv_native), ("shift9", conv_shift9),
             ("customvjp", conv_customvjp), ("patches", conv_patches)]
    for label, xs, ws in shapes:
        x = jnp.asarray(rng.standard_normal((bs,) + xs), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.bfloat16)
        for fname, fn in forms:
            if ws[0] == 1:
                if fname == "patches":
                    continue  # identical to dot1x1 for k=1
                if fname == "shift9":
                    fn = conv_dot1x1
            for wonly in (True, False):
                # correctness check once per (shape, form)
                if wonly:
                    ref = conv_native(x[:2], w)
                    got = fn(x[:2], w)
                    err = float(jnp.max(jnp.abs(
                        ref.astype(f32) - got.astype(f32))))
                    assert err < 1.0, (label, fname, err)
                bench(fn, x, w, bs, f"{label} {fname:9s}", wonly)


if __name__ == "__main__":
    main()
