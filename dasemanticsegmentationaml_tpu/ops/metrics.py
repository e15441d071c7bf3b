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


# one fp32 one-hot contraction stays integer-exact while every cell count
# is < 2^24; beyond that the einsum must be chunked (see confusion_matrix)
_FP32_EXACT_PIXELS = 1 << 24
# scan-chunk rows for the exact path: any value <= _FP32_EXACT_PIXELS is
# exact; 2^20 keeps the materialized per-chunk one-hot at ~80 MB on
# backends that don't fuse it (CPU)
_CHUNK = 1 << 20


def _confusion_fp32(labels: jax.Array, preds: jax.Array,
                    num_classes: int) -> jax.Array:
    valid = (labels >= 0) & (labels < num_classes)
    lab_oh = jax.nn.one_hot(
        jnp.where(valid, labels, 0), num_classes, dtype=jnp.float32
    )
    lab_oh = lab_oh * valid[:, None].astype(jnp.float32)
    pred_oh = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    return jnp.einsum(
        "pi,pj->ij", lab_oh, pred_oh, preferred_element_type=jnp.float32
    )


def confusion_matrix(
    labels: jax.Array, preds: jax.Array, num_classes: int
) -> jax.Array:
    """(num_classes, num_classes) confusion matrix, hist[label, pred],
    with EXACT integer counts at any batch size.

    Rows with label outside [0, num_classes) are dropped, matching
    ``fast_hist`` (reference utils.py:161-167).

    <= 2^24 pixels: one fp32 MXU einsum (every cell < 2^24 is fp32-exact),
    returned as fp32. Larger batches (e.g. 128 x 512 x 1024 = 67M px, the
    bench-peak eval batch) would silently round away increments once a
    dominant-class cell crosses 2^24 — so the einsum is chunked at the
    exact bound and accumulated in int32 (exact to 2^31), returned as
    int32. Callers accumulate in a dtype matching their window bound
    (train/evaluate.py)."""
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    n = labels.shape[0]
    if n <= _FP32_EXACT_PIXELS:
        return _confusion_fp32(labels, preds, num_classes)
    chunk = min(_CHUNK, _FP32_EXACT_PIXELS)
    k = -(-n // chunk)
    pad = k * chunk - n
    # padded labels are -1 -> invalid -> dropped rows
    labels = jnp.pad(labels, (0, pad), constant_values=-1)
    preds = jnp.pad(preds, (0, pad))

    def body(acc, xy):
        lab, prd = xy
        return acc + _confusion_fp32(lab, prd, num_classes).astype(
            jnp.int32), None

    acc0 = jnp.zeros((num_classes, num_classes), jnp.int32)
    hist, _ = jax.lax.scan(
        body, acc0, (labels.reshape(k, chunk), preds.reshape(k, chunk)))
    return hist


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
