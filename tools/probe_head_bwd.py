"""Micro-probe: where does the context-path/FFM/heads backward go?

ablate_loss_bwd.py: that segment costs 0.534 ms/img fwd+bwd vs 0.115
fwd (3.6x, vs the ~2x flop ratio of a conv backward). This times
value_and_grad of isolated pieces at the real shapes (bs=128, 1/8 res):

  conv        3x3 256->256 @ (B,64,128,256)      (conv_out's big conv)
  conv_bn_relu  same + BatchNorm(train) + relu
  convblk_ffm 1x1 384->256 @ (B,64,128,384) + BN + relu (FFM)
  arm16       ARM block @ (B,32,64,512)           (conv+BN+pool+gate)
  se_ffm      FFM attention @ (B,64,128,256)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1700 \
    python tools/probe_head_bwd.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dasemanticsegmentationaml_tpu.ops.norm import BatchNorm

CHAIN, REPS = 16, 3


def bench(make_loss, params, x, bs, label):
    def vg(params, x):
        val, grads = jax.value_and_grad(make_loss)(params, x)
        acc = val
        for leaf in jax.tree.leaves(grads):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
        return acc

    @jax.jit
    def chained(params, x):
        def body(carry, _):
            out = vg(params, carry)
            s = out.astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), out
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


class ConvOnly(nn.Module):
    feats: int = 256
    ksize: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.feats, (self.ksize, self.ksize),
                       use_bias=False, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)(x)


class ConvBNReLU(nn.Module):
    feats: int = 256
    ksize: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (self.ksize, self.ksize), use_bias=False,
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
        x = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)(x)
        return nn.relu(x)


class SEGate(nn.Module):
    feats: int = 256

    @nn.compact
    def __call__(self, x):
        a = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        a = nn.Conv(self.feats // 4, (1, 1), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(a.astype(jnp.bfloat16))
        a = nn.relu(a)
        a = nn.Conv(self.feats, (1, 1), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(a)
        a = jax.nn.sigmoid(a.astype(jnp.float32)).astype(jnp.bfloat16)
        return x * a + x


def run(module, shape, bs, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs,) + shape), jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0), x[:1])

    def loss(params, x):
        out = module.apply({"params": params, **{k: v for k, v in
                            variables.items() if k != "params"}},
                           x, mutable=list(
                               k for k in variables if k != "params"))
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-9)

    return bench(loss, variables["params"], x, bs, label)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    run(ConvOnly(256, 3), (64, 128, 256), bs, "conv3x3 256->256 @1/8   ")
    run(ConvBNReLU(256, 3), (64, 128, 256), bs, "conv3x3+BN+relu @1/8   ")
    run(ConvBNReLU(256, 1), (64, 128, 384), bs, "conv1x1 384->256+BN @1/8")
    run(ConvBNReLU(128, 3), (32, 64, 512), bs, "conv3x3 512->128+BN @1/16")
    run(SEGate(256), (64, 128, 256), bs, "FFM SE gate @1/8        ")


if __name__ == "__main__":
    main()
