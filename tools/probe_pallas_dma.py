"""Re-probe the Pallas HBM streaming bandwidth cap (real chip).

Round-1 finding (fused_stdc.py STATUS): pallas_call kernels stream HBM at
~150-170 GB/s on this stack while XLA elementwise ops reach 350-917 GB/s,
which parks the fused CatBottleneck kernels. Re-run after any jax/libtpu
bump (the round-1 MULTICHIP tail showed client/terminal libtpu builds
diverging, so bumps do land).

Measures: (a) XLA copy bandwidth (x + 0 elementwise), (b) a pallas
row-block copy kernel, both on a 256 MB bf16 buffer with the scan-chain
protocol.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
    python tools/probe_pallas_dma.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 16384, 8192          # 256 MB bf16
BLK = 256
CHAIN, REPS = 8, 3


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_copy(x):
    grid = (ROWS // BLK,)
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[pl.BlockSpec((BLK, COLS), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, COLS), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(x)


def bench(fn, x, label):
    @jax.jit
    def chained(x):
        def body(carry, _):
            out = fn(carry)
            return out, jnp.float32(0)
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        # scalar readback: a 256 MB result would cost ~7 s through the
        # tunnel and swamp the ~30 ms on-device chain; the scan carry
        # keeps every copy live, and reading the sum syncs the chain
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(chained(x))  # compile+warm (full readback = real sync)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        best = min(best, time.perf_counter() - t0)
    nbytes = ROWS * COLS * 2 * 2 * CHAIN  # read + write per iteration
    # subtract nothing for the readback: it is amortized over CHAIN and
    # the same for both paths; report both raw numbers
    print(f"{label}: {nbytes / best / 1e9:.1f} GB/s "
          f"(chain wall {best:.3f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, COLS)), jnp.bfloat16)
    jax.block_until_ready(x)
    bench(lambda a: a + jnp.bfloat16(0), x, "xla elementwise copy")
    bench(pallas_copy, x, "pallas block copy  ")


if __name__ == "__main__":
    main()
