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

Round-trip design: the metric state (19x19 hist + 2 scalars) accumulates
ON DEVICE in a donated carry, so the host enqueues eval steps without
ever blocking on a result -- on the tunneled TPU a per-batch readback
costs a full round trip and serializes the pipeline. The fp32 carry is
flushed to a host float64 accumulator on a window derived from the batch
pixel count (window * batch_pixels <= 2^24, the fp32 integer-exact
range), so every count is exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import metrics as _metrics
from ..ops.metrics import confusion_matrix


def _predict(model, variables, images, use_fused_kernel: bool):
    if use_fused_kernel:
        from ..ops.pallas import upsample_argmax

        feat, _f16, _f32 = model.apply(variables, images, train=False,
                                       method=type(model).features)
        return upsample_argmax(feat, images.shape[1:3])
    out, _out16, _out32 = model.apply(variables, images, train=False)
    return jnp.argmax(out, axis=-1).astype(jnp.int32)


def make_eval_step(model, num_classes: int, use_fused_kernel: bool = False):
    """Jitted: (variables, images, labels) -> (hist, n_correct, n_pixels).

    use_fused_kernel: route the upsample+argmax through the Pallas kernel
    (ops/pallas) -- bandwidth-optimal on TPU; bit-exact vs XLA for fp32
    logits, ~16-bit-exact for bf16 (see upsample_argmax's docstring).
    """

    @jax.jit
    def step(variables, images, labels):
        pred = _predict(model, variables, images, use_fused_kernel)
        labels32 = labels.astype(jnp.int32)
        hist = confusion_matrix(labels32, pred, num_classes)
        # int32 counts: exact to 2^31 pixels/batch (an fp32 sum of ones
        # silently rounds past 2^24 -- 67M px at the bench-peak bs=128)
        correct = jnp.count_nonzero(pred == labels32).astype(jnp.int32)
        total = jnp.asarray(pred.size, jnp.int32)
        return hist, correct, total

    return step


def make_eval_accum_step(model, num_classes: int,
                         use_fused_kernel: bool = False):
    """Jitted: (acc, variables, images, labels) -> acc, accumulating the
    (hist, correct, total) metric state on device. ``acc`` is donated, so
    the host can enqueue the whole eval without a per-batch readback."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(acc, variables, images, labels):
        hist, correct, total = acc
        pred = _predict(model, variables, images, use_fused_kernel)
        labels32 = labels.astype(jnp.int32)
        # the carry dtype (fp32 for small batches, int32 past the fp32
        # integer-exact bound -- see evaluate()) sets the window bound;
        # per-batch counts are computed exactly and cast exactly
        hist = hist + confusion_matrix(labels32, pred,
                                       num_classes).astype(hist.dtype)
        correct = correct + jnp.count_nonzero(
            pred == labels32).astype(correct.dtype)
        total = total + jnp.asarray(pred.size, total.dtype)
        return hist, correct, total

    return step


def make_eval_scan_step(model, num_classes: int,
                        use_fused_kernel: bool = False):
    """Jitted: (acc, variables, images, labels) -> acc where images/labels
    carry a leading WINDOW axis (K, B, ...) and a ``lax.scan`` walks the
    K batches on device in ONE dispatch.

    Motivation (the builder's ranked candidate #3 / VERDICT round 1): on
    the tunneled TPU every dispatch pays a host round trip, so a val pass
    at eval_batch_size b costs N/b round trips even with the donated-carry
    accumulator; scanning K batches per dispatch divides that by K. The
    per-batch metric math is identical -- the scan body is the same
    forward -> argmax -> confusion-matrix update."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_step(acc, variables, images, labels):
        def body(carry, xy):
            im, lb = xy
            hist, correct, total = carry
            pred = _predict(model, variables, im, use_fused_kernel)
            lb32 = lb.astype(jnp.int32)
            hist = hist + confusion_matrix(lb32, pred,
                                           num_classes).astype(hist.dtype)
            correct = correct + jnp.count_nonzero(
                pred == lb32).astype(correct.dtype)
            total = total + jnp.asarray(pred.size, total.dtype)
            return (hist, correct, total), None

        acc, _ = jax.lax.scan(body, acc, (images, labels))
        return acc

    return scan_step


def _zero_acc(num_classes: int, dtype=jnp.float32):
    return (jnp.zeros((num_classes, num_classes), dtype),
            jnp.zeros((), dtype), jnp.zeros((), dtype))


def evaluate(model, variables, loader, num_classes: int, *, prepare,
             use_fused_kernel: bool = False,
             print_results: bool = True,
             flush_every: int = 32,
             scan_window: int = 0,
             cross_process_sum: bool = False,
             fetch_timeout: float = 900.0) -> Tuple[float, float]:
    """Full-dataset eval; returns (precision, miou) like reference val().

    flush_every is a CAP on the device-accumulation window; the actual
    window is min(flush_every, bound // pixels_per_batch) so every
    histogram cell and the correct/total scalars stay inside the
    accumulator's integer-exact range before each float64 flush --
    counts are EXACT, not drift-bounded. Small batches accumulate in
    fp32 (bound 2^24); a batch bigger than 2^24 px alone (67M at the
    bench-peak bs=128) flips the accumulators to int32 (bound 2^31),
    and confusion_matrix chunks its einsum so the per-batch counts are
    exact too.

    scan_window > 1 groups that many same-shaped batches per dispatch via
    ``lax.scan`` (make_eval_scan_step) -- one tunnel round trip per
    window instead of per batch. Odd-shaped batches (drop_last=False
    tail) and sub-window leftovers take the per-batch step; the metric
    math is identical either way.

    cross_process_sum: multi-process runs pass each rank a LOADER OVER A
    SHARD of the val set and sum the (hist, correct, total) counts across
    processes before computing the metrics. The counts are integers held
    in float64, so the global sums -- and therefore mIoU/precision -- are
    BIT-IDENTICAL to a single process evaluating the full set (confusion
    matrices are order-independent integer sums), at 1/process_count the
    eval wall-clock. No-op with one process."""
    step = make_eval_accum_step(model, num_classes, use_fused_kernel)
    scan_step = (make_eval_scan_step(model, num_classes, use_fused_kernel)
                 if scan_window > 1 else None)
    hist = np.zeros((num_classes, num_classes), np.float64)
    correct = 0.0
    total = 0.0

    from ..data.pipeline import device_prefetch

    def prepared():
        for batch in loader:
            yield prepare(batch)

    acc = None  # created on the first batch, dtype sized to its pixels
    pending = 0
    flush_limit = None
    window = 0
    buf = []
    buf_shape = None
    acc_dtype = jnp.float32

    def flush(acc):
        nonlocal hist, correct, total
        hist += np.asarray(acc[0], np.float64)
        correct += float(acc[1])
        total += float(acc[2])
        return _zero_acc(num_classes, acc_dtype)

    def drain(acc, pending, n_new):
        pending += n_new
        if pending >= flush_limit:
            acc, pending = flush(acc), 0
        return acc, pending

    for images, labels in device_prefetch(prepared(), depth=2,
                                          transfer_timeout=fetch_timeout):
        if flush_limit is None:
            batch_pixels = int(np.prod(labels.shape))
            # accumulate in fp32 while a whole window stays under the
            # fp32 integer-exact bound; past it (one batch alone can be
            # 67M px at bs=128) switch the device accumulators to int32,
            # exact to 2^31 -- per-batch counts are exact either way
            # (confusion_matrix chunks its einsum at the fp32 bound)
            if batch_pixels > _metrics._FP32_EXACT_PIXELS:
                acc_dtype = jnp.int32
                bound = 2**31 - 1
            else:
                bound = _metrics._FP32_EXACT_PIXELS
            acc = _zero_acc(num_classes, acc_dtype)
            flush_limit = max(1, min(flush_every,
                                     bound // max(batch_pixels, 1)))
            # a full scan window must itself stay integer-exact
            window = min(scan_window, flush_limit) if scan_window > 1 else 0
        if window > 1:
            if buf_shape is None:
                buf_shape = (images.shape, labels.shape)
            if (images.shape, labels.shape) == buf_shape:
                buf.append((images, labels))
                if len(buf) == window:
                    if pending + window > flush_limit:
                        # flush BEFORE scanning so the carry never holds
                        # more than flush_limit batches (the integer-
                        # exactness bound); a scan adds `window` at once
                        acc, pending = flush(acc), 0
                    acc = scan_step(acc, variables,
                                    jnp.stack([b[0] for b in buf]),
                                    jnp.stack([b[1] for b in buf]))
                    acc, pending = drain(acc, pending, len(buf))
                    buf = []
                continue
        acc = step(acc, variables, images, labels)
        acc, pending = drain(acc, pending, 1)
    for images, labels in buf:  # sub-window leftovers
        acc = step(acc, variables, images, labels)
        acc, pending = drain(acc, pending, 1)
    if pending:
        flush(acc)
    if cross_process_sum and jax.process_count() > 1:
        from ..parallel.distributed import allreduce_counts

        hist, correct, total = allreduce_counts(hist, correct, total)
    precision = correct / max(total, 1.0)
    # IoU on the HOST in float64: jnp.asarray would downcast the exactly
    # accumulated float64 histogram to fp32 (x64 disabled), spending the
    # exact-count design for nothing; the reference's per_class_iu is
    # numpy float64 too (utils.py:170-172)
    diag = np.diagonal(hist)
    miou_list = diag / (hist.sum(axis=1) + hist.sum(axis=0) - diag + 1e-5)
    miou = float(np.mean(miou_list))
    if print_results:
        print("precision per pixel for test: %.3f" % precision)
        print("mIoU for validation: %.3f" % miou)
        print(f"mIoU per class: {miou_list}")
    return precision, miou
