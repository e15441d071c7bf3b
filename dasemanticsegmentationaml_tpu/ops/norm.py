"""Batch normalization with PyTorch-faithful semantics, TPU-friendly dtypes.

The reference relies on ``torch.nn.BatchNorm2d`` defaults everywhere
(reference model/stdcnet.py:10, model/model_stages.py:21,73,
model/discriminator.py:81-98):

* eps = 1e-5, momentum = 0.1
* training mode normalizes with the *biased* batch variance but updates the
  running variance with the *unbiased* estimate (Bessel-corrected),
* running stats: ``r = (1 - momentum) * r + momentum * batch_stat``.

``flax.linen.BatchNorm`` differs (it updates running var with the biased
estimate and uses the complementary momentum convention), so we implement our
own module to make checkpoint-parity and training-parity exact.

Normalization math runs in fp32 regardless of the compute dtype (this matches
torch.cuda.amp, which keeps BN in fp32 -- reference train.py:83), and the
output is cast back to ``dtype``.

Cross-replica ("sync BN") mode: pass ``axis_name`` to average batch statistics
over a mesh axis with ``lax.pmean``. The reference's ``nn.DataParallel`` keeps
per-replica stats (reference train.py:497), so ``axis_name=None`` is the
faithful default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over the trailing feature axis.

    Works on rank-2 (N, C) and rank-4 (N, H, W, C) inputs.

    Attributes:
      use_running_average: if True (eval mode), normalize with running stats.
      momentum: torch momentum (fraction of the *new* batch stat).
      epsilon: numerical eps inside the sqrt.
      dtype: compute/output dtype (params and stats are kept fp32).
      axis_name: optional mesh axis for cross-replica stat averaging.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, axis_name=self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                # Element count per feature (over all replicas in sync mode).
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, axis_name=self.axis_name)
                bessel = n / max(n - 1, 1)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value
                    + self.momentum * var * bessel
                )

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xf - mean) * inv + bias
        return y.astype(self.dtype)


def fold_bn_into_conv(
    kernel: jax.Array,
    conv_bias: Optional[jax.Array],
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
):
    """Fold an inference-mode BN into the preceding conv's weights.

    Given y = BN(conv(x, kernel) + conv_bias), returns (kernel', bias') such
    that y = conv(x, kernel') + bias'. ``kernel`` is HWIO; BN params are per
    output channel. Used by the folded-inference path (SURVEY.md section 2.2).
    """
    inv = scale / jnp.sqrt(var + eps)
    kernel_f = kernel * inv.reshape((1,) * (kernel.ndim - 1) + (-1,))
    b = conv_bias if conv_bias is not None else 0.0
    bias_f = (b - mean) * inv + bias
    return kernel_f, bias_f
