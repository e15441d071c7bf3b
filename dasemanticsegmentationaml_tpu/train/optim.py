"""Optimizers with exact PyTorch update semantics (optax transforms).

The reference uses three optimizers (train.py:501-509, 170-172):

* SGD(lr, momentum=0.9, weight_decay): torch semantics are
  g <- g + wd*p;  buf <- mu*buf + g;  p <- p - lr*buf
  (buf initialized to the first gradient). optax's ``trace`` matches buf;
  ``add_decayed_weights`` before it matches torch's pre-momentum decay
  (NOT decoupled AdamW-style decay).
* Adam(lr, betas=(0.9, 0.99)) for the discriminator (train.py:172): optax
  ``scale_by_adam`` with eps_root=0 and bias correction == torch.
* RMSprop(lr): torch alpha=0.99, eps=1e-8, eps OUTSIDE the sqrt --
  optax ``scale_by_rms(..., eps_in_sqrt=False)``.

The learning rate is a run-time hyperparameter (the poly schedule is driven
per-epoch from the host, including the compounding DA variant --
ops/schedules.py), so every optimizer is wrapped in
``optax.inject_hyperparams``: set ``opt_state.hyperparams['learning_rate']``
and the jitted step stays compiled once.
"""

from __future__ import annotations

from typing import Any, Optional

import optax


def make_optimizer(name: str, learning_rate: float, momentum: float = 0.9,
                   weight_decay: float = 0.0,
                   betas=(0.9, 0.999), eps: float = 1e-8,
                   mask: Optional[Any] = None,
                   weight_decay_mask: Optional[Any] = None):
    """Build an inject_hyperparams-wrapped optimizer.

    mask: optional pytree of bools -- False leaves receive no updates
    (used for the backbone classifier head that torch never updates because
    its grads stay None; see models/bisenet.py unused_param_mask).
    weight_decay_mask: optional decay/no-decay bool pytree (see
    group_weight_mask) -- decay applies only where True.
    """
    name = name.lower()

    def factory(learning_rate):
        if name == "sgd":
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay,
                                          mask=weight_decay_mask)
                if weight_decay else optax.identity(),
                optax.trace(decay=momentum) if momentum
                else optax.identity(),
                optax.scale(-learning_rate),
            )
        elif name == "adam":
            tx = optax.chain(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                    eps_root=0.0),
                optax.scale(-learning_rate),
            )
        elif name == "rmsprop":
            tx = optax.chain(
                optax.scale_by_rms(decay=0.99, eps=eps, eps_in_sqrt=False),
                optax.scale(-learning_rate),
            )
        else:
            raise ValueError(
                f"unsupported optimizer {name!r} (rmsprop|sgd|adam, "
                "reference train.py:501-509)")
        if mask is not None:
            tx = optax.masked(tx, mask)
        return tx

    return optax.inject_hyperparams(factory)(learning_rate=learning_rate)


def group_weight_mask(params) -> Any:
    """Decay/no-decay split (reference utils.py:273-295 ``group_weight``).

    The reference builds two torch param groups: conv/linear *weights* get
    weight decay, while biases and all norm-layer params don't. The optax
    equivalent is a boolean mask pytree for ``optax.masked`` /
    ``add_decayed_weights(mask=...)``: True (decay) exactly for rank>=2
    kernels, False for biases/BN scale/BN bias (rank 1). Use with
    ``make_optimizer(..., weight_decay_mask=group_weight_mask(params))``.
    """
    import jax

    return jax.tree.map(lambda p: p.ndim >= 2, params)


def set_learning_rate(opt_state, lr):
    """Pure update of hyperparams['learning_rate'] (jit-safe).

    Handles optax.MultiSteps wrapping (gradient accumulation, the honest
    --iter_size implementation) by recursing into the inner state.
    """
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiStepsState
        inner = set_learning_rate(opt_state.inner_opt_state, lr)
        return opt_state._replace(inner_opt_state=inner)
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp_asarray_like(hp["learning_rate"], lr)
    return opt_state._replace(hyperparams=hp)


def jnp_asarray_like(ref, value):
    import jax.numpy as jnp

    return jnp.asarray(value, dtype=getattr(ref, "dtype", None))
