"""One-program inference measurement: full eval path at ONE batch size.

Designed for flaky compile-service windows: a single jit program per
process invocation, so one healthy window is enough. Prints one line.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_full_once.py <bs>
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import init_bisenet_variables
from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax

H, W, CHAIN, REPS = 512, 1024, 32, 3


def main():
    bs = int(sys.argv[1])
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, H, W, 3))

    @jax.jit
    def full(variables, images):
        def body(carry, _):
            f8, _f16, _f32 = model.apply(variables, carry, train=False,
                                         method=type(model).features)
            pred = upsample_argmax(f8, (H, W))
            s = jnp.sum(pred).astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), jnp.sum(pred)
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.bfloat16)
    np.asarray(full(variables, images))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(full(variables, images))
        best = min(best, time.perf_counter() - t0)
    print(f"bs={bs}: full={bs * CHAIN / best:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
