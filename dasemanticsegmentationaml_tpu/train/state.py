"""Train state pytree: params + BN running stats + optimizer state."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct



@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(variables, optimizer) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
