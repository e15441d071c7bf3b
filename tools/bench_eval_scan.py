"""Measure the device-side eval scan (train/evaluate.py scan_window) on
the real chip: full-val-pass wall time, one dispatch per batch vs one per
window. VERDICT round-1 candidate #3 / CLAUDE.md candidate 3.

Run (TPU env, single process):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 560 python tools/bench_eval_scan.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables)
from dasemanticsegmentationaml_tpu.train import evaluate

H, W, B, NBATCH = 512, 1024, 8, 16


def main():
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, H, W, 3))
    rng = np.random.default_rng(0)
    # Pre-stage ALL batches on device: over the tunnel, H2D of 50 MB/batch
    # runs at ~38 MB/s and completely hides the dispatch latency this
    # bench wants to isolate (first attempt measured 6 img/s both ways,
    # transfer-bound). Real deployments stream H2D concurrently with
    # compute (device_prefetch); here we want the dispatch-rate ceiling.
    batches = []
    for _ in range(NBATCH):
        im = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
        lb = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
        batches.append((im, lb))
    jax.block_until_ready(batches[-1][0])
    prepare = lambda b: b  # noqa: E731

    on_tpu = jax.default_backend() == "tpu"
    for window in (0, 8):
        for rep in range(3):  # rep 0 = compile+warmup, time reps 1-2
            t0 = time.time()
            prec, miou = evaluate(model, variables, batches, 19,
                                  prepare=prepare, print_results=False,
                                  use_fused_kernel=on_tpu,
                                  scan_window=window)
            dt = time.time() - t0
            n = B * NBATCH
            if rep:
                print(f"window={window} rep={rep}: {dt:.2f}s "
                      f"({n / dt:.1f} img/s, miou={miou:.4f})", flush=True)
            else:
                print(f"window={window} compile+first: {dt:.1f}s",
                      flush=True)


if __name__ == "__main__":
    main()
