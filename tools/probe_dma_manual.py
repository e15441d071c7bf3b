"""Probe: is the Pallas HBM-streaming cap the auto-pipeliner or the DMA
engine?

probe_pallas_dma.py established (rounds 1-3) that a pallas_call with
BlockSpec-pipelined HBM<->VMEM blocks streams at ~100-170 GB/s while XLA
elementwise ops reach 164-917 GB/s on identical buffers, regardless of
block shape / grid granularity / dimension_semantics. All of those go
through Pallas' AUTOMATIC pipeline. This probe drives the DMA engine BY
HAND inside one kernel invocation (refs in ANY/HBM space, VMEM scratch,
pltpu.make_async_copy) to separate two hypotheses:

  auto-pipeliner overhead  -> manual DMA should recover XLA bandwidth,
                              unparking ops/pallas/fused_stdc.py
  engine/stack cap         -> manual DMA plateaus at the same ~150 GB/s,
                              and the park is final on this stack

Variants on the same 256 MB bf16 buffer as probe_pallas_dma.py:
  manual2   double-buffered HBM->VMEM->HBM copy (2 in + 2 out slots,
            every DMA started one chunk ahead; the guide's canonical
            double-buffer pattern)
  manual8   same with 8-deep in/out slot rings (tests DMA queue depth)
  hbm2hbm   direct HBM->HBM async copies, 8 in flight, no VMEM bounce

Measured (v5e, 2026-08-19, concurrent pytest on the 1-core host —
relative numbers are the finding):
  xla elementwise copy: 180.4 GB/s
  manual2 bounce copy : 117.5 GB/s
  manual8 bounce copy : 118.6 GB/s
  hbm2hbm direct copy : 116.2 GB/s
VERDICT: the cap is the DMA ENGINE path as driven from Pallas kernels
on this stack, not the auto-pipeliner — manual double buffering, 8-deep
queues, and even direct HBM->HBM (no VMEM bounce at all) land on the
same ~117 GB/s plateau as pallas_call's BlockSpec pipeline (110.5 this
round), while XLA's own copy moves 1.5x that. Nothing reachable from
kernel authoring changes this; fused_stdc stays parked until a libtpu
bump moves THIS probe, not just probe_pallas_dma.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 \
    python tools/probe_dma_manual.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 16384, 8192          # 256 MB bf16
CHAIN, REPS = 8, 3


def _bounce_kernel(n_slots, blk, x_ref, o_ref):
    """HBM->VMEM->HBM copy, n_slots-deep in/out DMA rings.

    VMEM scratch = n_slots * blk * COLS * 2 bytes; keep well under the
    16 MB scoped limit (a compile-side VMEM OOM wedges the remote
    compile service for hours — CLAUDE.md).
    """
    n = ROWS // blk

    def body(scratch, in_sems, out_sems):
        def in_dma(i):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * blk, blk), :],
                scratch.at[i % n_slots],
                in_sems.at[i % n_slots])

        def out_dma(i):
            return pltpu.make_async_copy(
                scratch.at[i % n_slots],
                o_ref.at[pl.ds(i * blk, blk), :],
                out_sems.at[i % n_slots])

        in_dma(0).start()

        def loop(i, _):
            # slot (i+1) % n_slots is reused by in_dma(i+1); its last
            # occupant was chunk i+1-n_slots whose out-DMA must be done
            @pl.when(i >= n_slots - 1)
            def _():
                out_dma(i - (n_slots - 1)).wait()

            @pl.when(i + 1 < n)
            def _():
                in_dma(i + 1).start()

            in_dma(i).wait()
            out_dma(i).start()
            return 0

        jax.lax.fori_loop(0, n, loop, 0)
        for k in range(min(n_slots - 1, n)):
            out_dma(n - 1 - k).wait()

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((n_slots, blk, COLS), jnp.bfloat16),
        in_sems=pltpu.SemaphoreType.DMA((n_slots,)),
        out_sems=pltpu.SemaphoreType.DMA((n_slots,)),
    )


def _hbm2hbm_kernel(x_ref, o_ref):
    blk = 128
    n = ROWS // blk
    depth = 8

    def body(sems):
        def dma(i):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * blk, blk), :],
                o_ref.at[pl.ds(i * blk, blk), :],
                sems.at[i % depth])

        def loop(i, _):
            @pl.when(i >= depth)
            def _():
                dma(i - depth).wait()

            dma(i).start()
            return 0

        jax.lax.fori_loop(0, n, loop, 0)
        for k in range(min(depth, n)):
            dma(n - 1 - k).wait()

    pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((depth,)))


def _call(kernel):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )


def bench(fn, x, label):
    @jax.jit
    def chained(x):
        def body(carry, _):
            return fn(carry), jnp.float32(0)
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(out.astype(jnp.float32))

    ref = float(jnp.sum(x.astype(jnp.float32)))
    got = float(np.asarray(chained(x)))
    assert abs(got - ref) / (abs(ref) + 1e-9) < 1e-3, (label, got, ref)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        best = min(best, time.perf_counter() - t0)
    nbytes = ROWS * COLS * 2 * 2 * CHAIN
    print(f"{label}: {nbytes / best / 1e9:.1f} GB/s "
          f"(chain wall {best:.3f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, COLS)), jnp.bfloat16)
    jax.block_until_ready(x)
    bench(lambda a: a + jnp.bfloat16(0), x, "xla elementwise copy")
    for name, fn in [
        # 2 slots x 2 MB = 4 MB scratch; 8 slots x 1 MB = 8 MB scratch
        ("manual2  bounce copy",
         _call(functools.partial(_bounce_kernel, 2, 128))),
        ("manual8  bounce copy",
         _call(functools.partial(_bounce_kernel, 8, 64))),
        ("hbm2hbm  direct copy", _call(_hbm2hbm_kernel)),
    ]:
        try:
            bench(fn, x, name)
        except Exception as e:  # unsupported path: report, keep probing
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
