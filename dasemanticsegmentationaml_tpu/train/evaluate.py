"""Evaluation (reference train.py:24-61 ``val``), fully on device.

The reference evaluates at batch 1 with a host argmax, a pure-Python pixel
accuracy loop, and numpy bincount histograms (the ranked perf sin,
SURVEY.md section 3.3). Here one jitted step does forward -> argmax ->
confusion-matrix update -> accuracy sums, and the host only accumulates
19x19 matrices. Batch size is free (the reference's bs=1 is an artifact of
its squeeze(0)).

Faithful metric semantics (tests assert both):
* mIoU masks labels outside [0, 19) -- ignore excluded (utils.py:161-167);
* 'precision' counts ignore pixels as wrong (utils.py:151-159), computed
  per-image then averaged (train.py:52-54) -- at fixed image size this
  equals the overall pixel mean, which is what we accumulate.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import confusion_matrix, per_class_iou


def make_eval_step(model, num_classes: int, use_fused_kernel: bool = False):
    """Jitted: (variables, images, labels) -> (hist, n_correct, n_pixels).

    use_fused_kernel: route the upsample+argmax through the Pallas kernel
    (ops/pallas) -- numerically identical, bandwidth-optimal on TPU.
    """

    @jax.jit
    def step(variables, images, labels):
        if use_fused_kernel:
            from ..ops.pallas import upsample_argmax

            feat, _f16, _f32 = model.apply(variables, images, train=False,
                                           method=type(model).features)
            pred = upsample_argmax(feat, images.shape[1:3])
        else:
            out, _out16, _out32 = model.apply(variables, images, train=False)
            pred = jnp.argmax(out, axis=-1).astype(jnp.int32)
        labels32 = labels.astype(jnp.int32)
        hist = confusion_matrix(labels32, pred, num_classes)
        correct = jnp.sum((pred == labels32).astype(jnp.float32))
        total = jnp.float32(pred.size)
        return hist, correct, total

    return step


def evaluate(model, variables, loader, num_classes: int, *, prepare,
             use_fused_kernel: bool = False,
             print_results: bool = True) -> Tuple[float, float]:
    """Full-dataset eval; returns (precision, miou) like reference val()."""
    step = make_eval_step(model, num_classes, use_fused_kernel)
    hist = np.zeros((num_classes, num_classes), np.float64)
    correct = 0.0
    total = 0.0

    from ..data.pipeline import device_prefetch

    def prepared():
        for batch in loader:
            yield prepare(batch)

    for images, labels in device_prefetch(prepared(), depth=2):
        h, c, t = step(variables, images, labels)
        hist += np.asarray(h, np.float64)
        correct += float(c)
        total += float(t)
    precision = correct / max(total, 1.0)
    miou_list = np.asarray(per_class_iou(jnp.asarray(hist)))
    miou = float(np.mean(miou_list))
    if print_results:
        print("precision per pixel for test: %.3f" % precision)
        print("mIoU for validation: %.3f" % miou)
        print(f"mIoU per class: {miou_list}")
    return precision, miou
