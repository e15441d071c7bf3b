"""Controls for probe_stage8_bwd.py: how much of the isolated-block time
is harness floor / isolation artifact vs real backward cost?

probe_stage8_bwd measured blk1 (Cat s2) at 1.455 ms/img fwd+bwd in
isolation (bs=64), yet ablate_bwd's in-graph marginal for ALL of stage8
is +0.305 ms/img (bs=128) and the whole train step is 1.53 ms/img.
These controls separate the candidate explanations:

  null      identity at blk1's input shape, same scan/carry/sum harness
            -> pure harness floor (carry update + fp32 sum + ones dgrad)
  fwd       blk1 forward only (no grad), same harness sum/carry
  params    blk1 value_and_grad wrt params ONLY (ablate_bwd style: no
            dgrad to the input, x is just the carry)
  both      wrt (params, x) -- the probe_stage8_bwd configuration

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python tools/probe_stage8_controls.py [bs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models.stdcnet import CatBottleneck

CHAIN, REPS = 16, 3


def timeit(chained, params, x, bs, label):
    np.asarray(chained(params, x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(params, x))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN / bs * 1e3
    print(f"{label}: {ms:.4f} ms/img", flush=True)
    return ms


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shape, bf = (256, 512, 64), jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs,) + shape), bf)

    module = CatBottleneck(256, block_num=4, stride=2, dtype=bf)
    variables = module.init(jax.random.PRNGKey(0), x[:1])
    extra = {k: v for k, v in variables.items() if k != "params"}
    mutable = [k for k in variables if k != "params"]

    def apply_sum(params, xx):
        out = module.apply({"params": params, **extra}, xx, train=True,
                           mutable=mutable)[0]
        return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-9)

    def null_loss(params, xx):
        del params
        return jnp.sum((xx * jnp.bfloat16(1.000001)).astype(jnp.float32)) \
            * jnp.float32(1e-9)

    def mk(body_fn):
        @jax.jit
        def chained(params, xx):
            def body(carry, _):
                out, gx = body_fn(params, carry)
                s = out.astype(jnp.float32) * jnp.float32(1e-30)
                nxt = carry + s.astype(carry.dtype)
                if gx is not None:
                    nxt = nxt + (gx * jnp.asarray(1e-30, gx.dtype)).astype(
                        carry.dtype)
                return nxt, out
            _, sums = jax.lax.scan(body, xx, None, length=CHAIN)
            return sums
        return chained

    def null_body(params, xx):
        out, gx = jax.value_and_grad(null_loss, argnums=1)(params, xx)
        return out, gx

    def fwd_body(params, xx):
        return apply_sum(params, xx), None

    def params_body(params, xx):
        out, gp = jax.value_and_grad(apply_sum)(params, xx)
        acc = out
        for leaf in jax.tree.leaves(gp):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
        return acc, None

    def both_body(params, xx):
        out, (gp, gx) = jax.value_and_grad(apply_sum, argnums=(0, 1))(
            params, xx)
        acc = out
        for leaf in jax.tree.leaves(gp):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-9
        return acc, gx

    p = variables["params"]
    timeit(mk(null_body), p, x, bs, "null   identity+harness  ")
    timeit(mk(fwd_body), p, x, bs, "fwd    blk1 forward only  ")
    timeit(mk(params_body), p, x, bs, "params blk1 wgrad only    ")
    timeit(mk(both_body), p, x, bs, "both   blk1 wgrad+dgrad   ")


if __name__ == "__main__":
    main()
