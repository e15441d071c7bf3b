"""Losses: CE with ignore_index, OHEM CE, BCE-with-logits.

Faithful re-derivations of the reference's loss surface:

* ``torch.nn.CrossEntropyLoss(ignore_index=255)`` applied to each of the
  three BiSeNet heads and summed (reference train.py:66,86-89,214-217).
* ``OHEM_CrossEntroy_Loss(threshold, keep_num)`` -- top-k / threshold hard
  example mining (reference utils.py:256-271; defined there but never wired
  into a trainer -- here it is a first-class, actually usable option).
* ``torch.nn.BCEWithLogitsLoss`` for the adversarial discriminator game
  (reference train.py:173,231,249,258).

All reductions run in fp32 regardless of logits dtype. Logits are NHWC
(class axis last -- TPU lane axis), labels are integer NHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits: jax.Array, labels: jax.Array, ignore_index: int):
    """Per-pixel CE in fp32; returns (loss_map, valid_mask)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    # manual logsumexp: jax.nn.logsumexp's inf-handling selects lower to a
    # pathological TPU program here (measured >100x slower than this form)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = jnp.squeeze(m, -1) + jnp.log(
        jnp.sum(jnp.exp(logits - m), axis=-1))
    # one-hot contraction instead of take_along_axis: a lane gather on TPU
    # serializes (measured ~70 ms per head at 8x512x1024x19); the
    # compare+select+sum form is pure VPU and fuses with the lse pass.
    one_hot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    picked = jnp.sum(logits * one_hot, axis=-1)
    loss = lse - picked
    return jnp.where(valid, loss, 0.0), valid


def cross_entropy_ignore(
    logits: jax.Array, labels: jax.Array, ignore_index: int = 255
) -> jax.Array:
    """Mean CE over non-ignored pixels (torch 'mean' reduction semantics).

    DELIBERATE deviation for the all-ignored edge: a batch whose every
    label is ``ignore_index`` returns loss 0 (zero gradients), whereas
    torch's CrossEntropyLoss(reduction='mean') returns 0/0 = NaN and
    NaN-poisons the weights from that step onward (reference
    train.py:86-89 has no guard). A random crop over a pure-void region
    should be a no-op step, not a destroyed run; the count clamp below
    is that choice. Parity oracles never hit this edge (their crops
    always contain valid pixels)."""
    loss, valid = _per_pixel_ce(logits, labels, ignore_index)
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(loss) / count


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    threshold: float,
    keep_num: int,
    ignore_index: int = 255,
) -> jax.Array:
    """Online hard example mining CE (reference utils.py:256-271).

    Sorts per-pixel losses descending; if the keep_num-th loss exceeds
    ``threshold`` keeps all pixels with loss > threshold, else keeps exactly
    the top ``keep_num``. Expressed branch-free for jit: both candidate means
    are computed with masks and selected with ``jnp.where``.
    """
    loss, valid = _per_pixel_ce(logits, labels, ignore_index)
    flat = jnp.where(valid.reshape(-1), loss.reshape(-1), -jnp.inf)
    sorted_desc = jnp.sort(flat)[::-1]
    k = min(keep_num, flat.shape[0] - 1)
    kth = sorted_desc[k]

    above = sorted_desc > threshold
    n_above = jnp.maximum(jnp.sum(above.astype(jnp.float32)), 1.0)
    mean_above = jnp.sum(jnp.where(above, sorted_desc, 0.0)) / n_above

    topk = sorted_desc[:k]
    finite = jnp.isfinite(topk)
    n_topk = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
    mean_topk = jnp.sum(jnp.where(finite, topk, 0.0)) / n_topk

    return jnp.where(kth > threshold, mean_above, mean_topk)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically stable mean BCE-with-logits (torch formulation).

    loss = max(x, 0) - x*y + log(1 + exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    y = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), x.shape)
    loss = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)
