"""Supervised trainer (reference train.py:63-120), TPU-native.

One jitted step = forward (3 heads) + summed CE(ignore=255) + backward +
optimizer update + BN running-stat update. The reference's AMP autocast +
GradScaler (train.py:65,83,91-93) maps to a bf16 compute policy -- bf16 has
fp32's exponent range, so no loss scaling is needed on TPU
(SURVEY.md section 2.2 row 2).

The epoch loop mirrors the reference: per-epoch standard poly LR
(train.py:71), checkpoint every ``checkpoint_step`` epochs, validation +
best-mIoU tracking every ``validation_step`` (train.py:106-120), identical
TensorBoard scalar names (loss_step / epoch/loss_epoch_train /
epoch/precision_val / 'epoch/miou val').

Data parallelism: the step is jitted over a Mesh with the batch sharded on
the 'data' axis and params replicated; XLA SPMD inserts the gradient
all-reduce (SURVEY.md section 2.3). BatchNorm under global-jit semantics
normalizes over the GLOBAL batch (sync-BN, the "correct" mode); the
reference's per-replica DataParallel BN is available via
parallel.per_replica (shard_map) when faithfulness matters.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import cross_entropy_ignore, ohem_cross_entropy
from ..ops.schedules import PolyLR
from .optim import set_learning_rate
from .state import TrainState


def make_supervised_loss(model, *, ohem: Optional[dict] = None,
                         ignore_index: int = 255):
    """(params, batch_stats, images, labels) -> (loss, new_batch_stats).

    The reference's 3-head summed CE(ignore=255) (train.py:86-89), with
    OHEM as the --loss ohem option (utils.py:256-271, shipped-but-unwired
    there). On TPU the plain-CE path runs the heads at native stride and
    fuses the align_corners upsample into the CE
    (ops/pallas/fused_ce.py), so full-resolution logits never
    materialize in HBM fwd or bwd. Shared by the single-device step and
    the sharded per-replica-BN step (parallel.mesh)."""

    def loss_of(out, labels):
        if ohem is not None:
            return ohem_cross_entropy(out, labels, ohem["threshold"],
                                      ohem["keep_num"], ignore_index)
        return cross_entropy_ignore(out, labels, ignore_index)

    # the fused kernel computes in bf16 taps; the fp32 parity
    # configuration (--dtype float32) must keep the exact fp32 HIGHEST
    # XLA path (CLAUDE.md parity rule) — gate on the model dtype
    use_fused_loss = (ohem is None and jax.default_backend() == "tpu"
                      and getattr(model, "dtype", None) == jnp.bfloat16)

    def loss_and_stats(params, batch_stats, images, labels):
        variables = {"params": params, "batch_stats": batch_stats}
        if use_fused_loss:
            from ..ops.pallas.fused_ce import cross_entropy_upsampled

            (f, f16, f32), mutated = model.apply(
                variables, images, train=True, mutable=["batch_stats"],
                method=type(model).features)
            hw = images.shape[1:3]
            loss = (cross_entropy_upsampled(f, labels, hw, ignore_index)
                    + cross_entropy_upsampled(f16, labels, hw,
                                              ignore_index)
                    + cross_entropy_upsampled(f32, labels, hw,
                                              ignore_index))
            return loss, mutated["batch_stats"]
        (out, out16, out32), mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"])
        loss = (loss_of(out, labels) + loss_of(out16, labels)
                + loss_of(out32, labels))
        return loss, mutated["batch_stats"]

    return loss_and_stats


def make_train_step(model, optimizer, *, ohem: Optional[dict] = None,
                    ignore_index: int = 255, donate: bool = True):
    """Build the jitted supervised train step.

    ohem: optional {'threshold': float, 'keep_num': int} to use OHEM CE
    (reference utils.py:256-271 -- shipped but unwired there; first-class
    here via --loss ohem).
    """
    loss_and_stats = make_supervised_loss(model, ohem=ohem,
                                          ignore_index=ignore_index)

    def step(state: TrainState, images, labels, lr):
        def loss_fn(params):
            return loss_and_stats(params, state.batch_stats, images,
                                  labels)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, new_opt_state = optimizer.update(grads, opt_state,
                                                  state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt_state, step=state.step + 1)
        return new_state, loss

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def train(args, model, state: TrainState, optimizer, loader_train,
          loader_val, *, prepare, evaluate_fn, writer=None, logger=None,
          checkpoint_fn: Optional[Callable] = None, profiler=None,
          train_step: Optional[Callable] = None,
          report_fn: Optional[Callable] = None):
    """Epoch loop with reference-parity bookkeeping (train.py:63-120).

    prepare(batch, epoch, it) -> (images, labels) on device.
    evaluate_fn(state) -> (precision, miou).
    checkpoint_fn(state, name) persists 'latest'/'best'.
    train_step: optional prebuilt (state, images, labels, lr) -> (state,
    loss) step -- used by the CLI's --sync_bn False per-replica-BN mode
    (parallel.mesh.make_sharded_train_step).
    """
    if train_step is None:
        train_step = make_train_step(
            model, optimizer,
            ohem=(args.ohem if getattr(args, "loss", "crossentropy") == "ohem"
                  else None))
    sched = PolyLR(args.learning_rate, args.num_epochs, mode="standard")
    max_miou = 0.0
    step_count = 0

    for epoch in range(getattr(args, "epoch_start_i", 0), args.num_epochs):
        lr = sched(epoch)
        loader_train.set_epoch(epoch)
        losses = []
        t0 = time.time()
        n_images = 0
        max_steps = getattr(args, "max_steps_per_epoch", None)

        def prepared_batches():
            # Eager 2-deep lookahead (data/pipeline.device_prefetch):
            # prepare() dispatches the H2D copy + device transform
            # asynchronously, so the next batch stages while the current
            # step runs (SURVEY.md section 2.2 row 5 double buffering).
            for it_, batch_ in enumerate(loader_train):
                if max_steps is not None and it_ >= max_steps:
                    break
                yield prepare(batch_, epoch, it_)

        from ..data.pipeline import device_prefetch

        for it, (images, labels) in enumerate(
                device_prefetch(prepared_batches(), depth=2,
                                transfer_timeout=getattr(
                                    args, "fetch_timeout", 900.0))):
            state, loss = train_step(state, images, labels, lr)
            if profiler is not None:
                profiler.step()
            step_count += 1
            losses.append(loss)
            n_images += images.shape[0]
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        # ONE host readback per epoch: a per-step float(loss) would force
        # a device sync (a tunnel round trip on remote TPU) every step and
        # defeat device_prefetch; the per-step TB scalars are flushed here
        # from the same stacked readback instead (identical tags/values).
        losses_host = (np.asarray(jnp.stack(losses)) if losses
                       else np.zeros(0, np.float32))
        loss_train_mean = float(losses_host.mean()) if losses else 0.0
        if writer is not None:
            first_step = step_count - len(losses) + 1
            for i, lv in enumerate(losses_host):
                writer.add_scalar("loss_step", float(lv), first_step + i)
            writer.add_scalar("epoch/loss_epoch_train", loss_train_mean,
                              epoch)
        if logger is not None:
            logger.log(epoch=epoch, lr=lr, loss=loss_train_mean,
                       images_per_sec=n_images / max(dt, 1e-9))
        print("loss for train : %f" % loss_train_mean)

        if epoch % args.checkpoint_step == 0 and epoch != 0 \
                and checkpoint_fn is not None:
            checkpoint_fn(state, "latest", epoch=epoch)

        if epoch % args.validation_step == 0 and epoch != 0:
            precision, miou = evaluate_fn(state)
            if report_fn is not None:
                report_fn(epoch, miou)
            if miou > max_miou:
                max_miou = miou
                if checkpoint_fn is not None:
                    checkpoint_fn(state, "best", epoch=epoch)
            if writer is not None:
                writer.add_scalar("epoch/precision_val", precision, epoch)
                writer.add_scalar("epoch/miou val", miou, epoch)
    return state, max_miou
