"""Fine-grained fwd+bwd attribution INSIDE stage8 (the backward hotspot).

ablate_bwd.py: stage8 adds +0.305 ms/img fwd+bwd on top of its 0.086
fwd (3.5x, vs the ~3x flop ratio of conv fwd:fwd+bwd) and the backbone
backward overall runs ~19% MXU. This probe splits the two stage-8
CatBottlenecks (reference stdcnet.py:66-113) into their constituent ops
and times each fwd+bwd at the real shapes, differentiating wrt BOTH
params and input -- unlike probe_head_bwd.py, whose params-only grads
never exercised dgrad on a single-conv probe.

Pieces (spatial at 1024x512 input; B = batch):
  blk1.conv1   1x1  64->128 @ (B,256,512, 64)   1/4-res entry conv
  blk1.avd     dw3x3 s2 128 @ (B,256,512,128)   depthwise downsample
  blk1.pool    avg3x3 s2    @ (B,256,512,128)   skip branch (ones-dw-conv)
  blk1.conv2   3x3 128->64  @ (B,128,256,128)
  blk1.conv3   3x3  64->32  @ (B,128,256, 64)
  blk1.conv4   3x3  32->32  @ (B,128,256, 32)
  blk2.conv1   1x1 256->128 @ (B,128,256,256)
  blk1.full    CatBottleneck(256,4,s2) @ (B,256,512,64)
  blk2.full    CatBottleneck(256,4,s1) @ (B,128,256,256)

Default bs=64 (the 1/4-res pieces at bs=128 would put ~13 GB of
fwd+bwd live tensors on a 16 GB chip); pass bs on argv to compare.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1700 \
    python tools/probe_stage8_bwd.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dasemanticsegmentationaml_tpu.models.stdcnet import (CatBottleneck,
                                                          ConvX, _conv,
                                                          avg_pool_3x3_s2)
from dasemanticsegmentationaml_tpu.ops.norm import BatchNorm

CHAIN, REPS = 16, 3


class DWConvBN(nn.Module):
    """The real avd_layer: depthwise 3x3 s2 + BN (stdcnet.py:72-77)."""

    channels: int = 128

    @nn.compact
    def __call__(self, x, train=True):
        x = _conv(self.channels, 3, 2, groups=self.channels,
                  dtype=jnp.bfloat16)(x)
        return BatchNorm(dtype=jnp.bfloat16)(
            x, use_running_average=not train)


def bench(loss, params, x, bs, label):
    """Time value_and_grad wrt (params, x) chained on device."""
    def vg(params, x):
        val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        acc = val
        for leaf in jax.tree.leaves(gp):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
        return acc, gx

    @jax.jit
    def chained(params, x):
        def body(carry, _):
            out, gx = vg(params, carry)
            # data dependency through BOTH the scalar and the input grad
            s = out.astype(jnp.float32) * jnp.float32(1e-30)
            nxt = carry + s.astype(carry.dtype) + \
                (gx * jnp.asarray(1e-30, gx.dtype)).astype(carry.dtype)
            return nxt, out
        _, sums = jax.lax.scan(body, x, None, length=CHAIN)
        return sums

    np.asarray(chained(params, x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(params, x))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN / bs * 1e3
    print(f"{label}: {ms:.4f} ms/img fwd+bwd", flush=True)
    return ms


def run_module(module, shape, bs, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs,) + shape), jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0), x[:1])
    extra = {k: v for k, v in variables.items() if k != "params"}
    mutable = [k for k in variables if k != "params"]

    def loss(params, x):
        out = module.apply({"params": params, **extra}, x, train=True,
                           mutable=mutable)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-9)

    return bench(loss, variables["params"], x, bs, label)


def run_pool(shape, bs, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs,) + shape), jnp.bfloat16)

    def loss(params, x):
        del params
        return jnp.sum(avg_pool_3x3_s2(x).astype(jnp.float32)) * \
            jnp.float32(1e-9)

    return bench(loss, {}, x, bs, label)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bf = jnp.bfloat16
    run_module(ConvX(128, kernel=1, dtype=bf), (256, 512, 64), bs,
               "blk1.conv1 1x1  64->128 @1/4")
    run_module(DWConvBN(128), (256, 512, 128), bs,
               "blk1.avd  dw3x3s2 128 @1/4")
    run_pool((256, 512, 128), bs, "blk1.pool avg3x3s2 @1/4  ")
    run_module(ConvX(64, kernel=3, dtype=bf), (128, 256, 128), bs,
               "blk1.conv2 3x3 128->64 @1/8")
    run_module(ConvX(32, kernel=3, dtype=bf), (128, 256, 64), bs,
               "blk1.conv3 3x3  64->32 @1/8")
    run_module(ConvX(32, kernel=3, dtype=bf), (128, 256, 32), bs,
               "blk1.conv4 3x3  32->32 @1/8")
    run_module(ConvX(128, kernel=1, dtype=bf), (128, 256, 256), bs,
               "blk2.conv1 1x1 256->128 @1/8")
    run_module(CatBottleneck(256, block_num=4, stride=2, dtype=bf),
               (256, 512, 64), bs, "blk1.full  Cat s2       ")
    run_module(CatBottleneck(256, block_num=4, stride=1, dtype=bf),
               (128, 256, 256), bs, "blk2.full  Cat s1       ")


if __name__ == "__main__":
    main()
