"""Segmentation metrics as jitted device code.

The reference computes its metrics on host with numpy + a pure-Python pixel
loop (reference utils.py:151-172, train.py:46-47): ``fast_hist`` builds a
19x19 confusion matrix with np.bincount and ``compute_global_accuracy``
iterates over every pixel in the Python interpreter -- the documented perf
sin (SURVEY.md section 3.3). Here both are single fused XLA computations:

* the confusion matrix is a one-hot(label)^T @ one-hot(pred) matmul, which
  XLA tiles onto the MXU (cheap at 19 classes / 0.5M pixels),
* accuracy is a vectorized mean.

Semantics parity notes (asserted by tests):
* ``fast_hist(a=label, b=pred, n)`` masks rows where the *label* is outside
  [0, n) -- 255-ignore pixels are excluded from IoU (reference
  utils.py:161-167, called with (label, predict) at train.py:47).
* ``compute_global_accuracy`` does NOT mask ignore pixels: a 255 label can
  never equal a [0,19) prediction, so those pixels count as wrong
  (reference utils.py:151-159). We reproduce that faithfully and also offer
  the corrected masked variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    labels: jax.Array, preds: jax.Array, num_classes: int
) -> jax.Array:
    """fp32 (num_classes, num_classes) confusion matrix, hist[label, pred].

    Rows with label outside [0, num_classes) are dropped, matching
    ``fast_hist`` (reference utils.py:161-167).
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    valid = (labels >= 0) & (labels < num_classes)
    lab_oh = jax.nn.one_hot(
        jnp.where(valid, labels, 0), num_classes, dtype=jnp.float32
    )
    lab_oh = lab_oh * valid[:, None].astype(jnp.float32)
    pred_oh = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    return jnp.einsum(
        "pi,pj->ij", lab_oh, pred_oh, preferred_element_type=jnp.float32
    )


def per_class_iou(hist: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Per-class IoU from a confusion matrix (reference utils.py:170-172)."""
    diag = jnp.diagonal(hist)
    return diag / (hist.sum(axis=1) + hist.sum(axis=0) - diag + epsilon)


def global_pixel_accuracy(labels: jax.Array, preds: jax.Array) -> jax.Array:
    """Reference-faithful accuracy: ignore pixels count as wrong
    (reference utils.py:151-159)."""
    eq = (labels.reshape(-1) == preds.reshape(-1)).astype(jnp.float32)
    return jnp.mean(eq)


def global_pixel_accuracy_masked(
    labels: jax.Array, preds: jax.Array, num_classes: int
) -> jax.Array:
    """Corrected accuracy over non-ignored pixels only."""
    labels = labels.reshape(-1)
    preds = preds.reshape(-1)
    valid = (labels >= 0) & (labels < num_classes)
    eq = ((labels == preds) & valid).astype(jnp.float32)
    return jnp.sum(eq) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
