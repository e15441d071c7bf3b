"""Measure the cost of per-step host readbacks in the train loop
(VERDICT round-2 weak #1).

Runs K supervised train steps on synthetic device-resident batches two
ways:
  old: float(loss) after every step (what `--tensorboard True` used to do
       in train/supervised.py — one device sync / tunnel round trip per
       step, serializing dispatch);
  new: buffer the device scalars, ONE stacked readback at the end (what
       both trainers do now).

Run on the real chip (default env): PYTHONPATH=/root/repo:/root/.axon_site
python tools/probe_tb_sync.py [batch] [steps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables, unused_param_mask)
from dasemanticsegmentationaml_tpu.train import (create_train_state,
                                                 make_train_step)
from dasemanticsegmentationaml_tpu.train.optim import make_optimizer


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = 512, 1024

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, h, w, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=1e-4,
                         mask=unused_param_mask(v["params"]))
    step = make_train_step(model, opt, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, h, w, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 19, (bs, h, w)), jnp.int32)

    state = create_train_state(v, opt)
    state, loss = step(state, x, y, 0.01)
    float(loss)  # compile + sync

    def run(per_step_float: bool):
        nonlocal state
        losses = []
        t0 = time.perf_counter()
        s = state
        for _ in range(steps):
            s, loss = step(s, x, y, 0.01)
            if per_step_float:
                losses.append(float(loss))  # device sync per step
            else:
                losses.append(loss)
        if not per_step_float:
            losses = list(np.asarray(jnp.stack(losses)))  # one readback
        # full host readback with a data dependency on the final state:
        # the only trustworthy sync over the tunnel (CLAUDE.md)
        np.asarray(jnp.sum(jax.tree.leaves(s.params)[0]))
        return bs * steps / (time.perf_counter() - t0)

    for label, flag in (("old per-step float()", True),
                        ("new deferred flush ", False),
                        ("old per-step float()", True),
                        ("new deferred flush ", False)):
        fps = run(flag)
        print(f"{label}: {fps:7.1f} img/s")


if __name__ == "__main__":
    main()
