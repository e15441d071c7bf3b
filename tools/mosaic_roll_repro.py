"""Minimal repro: Mosaic fails to lower ``pltpu.roll`` on 16-bit data.

Found while building the fused CatBottleneck kernels
(dasemanticsegmentationaml_tpu/ops/pallas/fused_stdc.py): rolling a
bfloat16 (or int16) tile along the lane axis dies in Mosaic with

    NotImplementedError: Rotate with non-32-bit data

while the identical program on float32/int32 lowers and runs fine.
``jnp.roll`` inside a Pallas TPU kernel hits the same code path.

Workarounds used in this repo: operate on fp32 inside the kernel and
cast at the edges, or express the shift as two static lane slices plus
a concatenate (which Mosaic handles at any dtype).

Run on a TPU host: ``python tools/mosaic_roll_repro.py``.
Environment first observed: jax/jaxlib 0.9.0 (libtpu bundled), v5e.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1, 1)


def roll_once(dtype):
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128).astype(dtype)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return jax.block_until_ready(out)


if __name__ == "__main__":
    for dtype in (jnp.float32, jnp.bfloat16):
        name = jnp.dtype(dtype).name
        try:
            roll_once(dtype)
            print(f"{name}: ok")
        except Exception as e:  # noqa: BLE001 - repro prints any failure
            print(f"{name}: FAILED - {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
