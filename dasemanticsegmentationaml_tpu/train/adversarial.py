"""Adversarial domain-adaptation trainer (reference train.py:134-299).

The reference's 4-phase step per batch (train.py:192-262), expressed as one
jitted function with explicit functional dataflow instead of requires_grad
flips and interleaved ``.backward()`` calls:

  1. G-seg : outs_src = G(src) (train mode, G BN update #1);
             3-head CE summed; SGD step -> G'
             (train.py:211-221)
  2. G-adv : outs_tgt = G'(tgt) (G BN update #2);
             D(softmax(outs_tgt[head])) with D in train mode (D BN update
             #1, matching torch where requires_grad=False still updates
             running stats); loss = lambda_adv * BCE(vs source-label 0);
             gradients w.r.t. G' only (D frozen == no grad path to D
             params in the functional form); SGD step -> G''
             (train.py:207-208,223-237)
  3. D-src : D(softmax(outs_src[head]).detach()) -> BCE vs 0 -> Adam step
             (D BN update #2) (train.py:243-254)
  4. D-tgt : D(softmax(outs_tgt[head]).detach()) -> BCE vs 1 -> Adam step
             (D BN update #3) (train.py:256-262)

Note phase 3/4 reuse the activations from phases 1/2 (no recompute), i.e.
outs_src comes from the PRE-update G and outs_tgt from the once-updated G',
exactly like the torch autograd graph.

Phase-2 optimizer semantics: params not on the adversarial path (the
conv_out16/conv_out32 aux heads) receive ZERO gradients there, and this
step still applies momentum decay + weight decay to them -- torch<2.0
``zero_grad()`` behavior (grads zeroed in place), which is what the
reference's era ran (requirements.txt pins no version). torch>=2.0
defaults to set_to_none=True, under which SGD skips those params
entirely; tests/test_train_equivalence.py pins the torch<2.0 semantics
with an explicit ``zero_grad(set_to_none=False)`` oracle.

``d_head``: the main trainer feeds the full-resolution main head to D
(train.py:230 -> output), while the NNI variant feeds the out32 auxiliary
head (reference train_nni.py:135,150,156); both are supported.

``step_mode``: the NNI trial script (reference train_nni.py:105-163) runs a
DIFFERENT update algorithm from train.py's 4-phase step -- ONE
``zero_grad`` per optimizer at step start, all four backward passes
accumulated, then ONE ``scaler.step`` per optimizer (train_nni.py:116-117,
127,141,153,159,161-163). The observable differences from the interleaved
mode:

  * both G forwards (source and target) happen at the SAME initial
    weights -- there is no once-updated G' for the target pass;
  * G receives a single SGD update on grad(seg) + grad(lambda_adv * adv)
    summed at those initial weights (two sequential updates otherwise);
  * D receives a single Adam update on grad(BCE_src) + grad(BCE_tgt),
    both forwards at the OLD D weights (interleaved: the target forward
    sees the post-source-step D).

``step_mode='combined'`` reproduces that ordering exactly;
``'interleaved'`` (default) is train.py:192-262. BN running stats update
in torch module-call order in both modes (G: src then tgt; D: adv, src,
tgt -- D train-mode forwards update stats even under requires_grad=False).

The epoch loop reproduces the reference's *compounding* poly LR (train.py:
185-186 feeds the current lr back as init) and its checkpoint naming
(GTA5_<step>.pth / GTA5_<step>_D1.pth with DataParallel-style 'module.'
prefixes, train.py:280-283).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import bce_with_logits, cross_entropy_ignore
from ..ops.resize import resize_bilinear_align_corners
from ..ops.schedules import PolyLR
from .optim import set_learning_rate
from .state import TrainState

SOURCE_LABEL = 0.0  # reference train.py:181
TARGET_LABEL = 1.0  # reference train.py:182


def make_da_step(g_model, d_model, g_optimizer, d_optimizer, *,
                 lambda_adv: float, ignore_index: int = 255,
                 d_head: int = 0, donate: bool = True,
                 pmean_axis: Optional[str] = None, jit: bool = True,
                 step_mode: str = "interleaved"):
    """Build the jitted DA step.

    Returns step(g_state, d_state, src_images, src_labels, tgt_images,
                 lr_g, lr_d) -> (g_state, d_state, metrics dict).

    step_mode: 'interleaved' = the main trainer's 4-phase step with
    per-phase optimizer steps (reference train.py:192-262); 'combined' =
    the NNI trial's single-zero-grad accumulate-then-step ordering
    (reference train_nni.py:105-163) -- see the module docstring for the
    exact semantic differences.

    pmean_axis + jit=False: the per-replica-BN data-parallel variant --
    the raw step for ``parallel.mesh.make_sharded_da_step``'s shard_map,
    with each phase's gradients (and the metrics) pmean'd across the
    axis while BN stats stay local, matching DataParallel's
    mean-reduced grads + unsynced BN (reference train.py:145-152).
    """
    if step_mode not in ("interleaved", "combined"):
        raise ValueError(f"unknown DA step_mode: {step_mode!r}")
    if pmean_axis is not None:
        def reduce(tree):
            return jax.lax.pmean(tree, pmean_axis)
    else:
        def reduce(tree):
            return tree

    def g_apply_feats(params, stats, x):
        # Head logits at native stride (1/8, 1/8, 1/16). Only the head D
        # consumes is bilinearly upsampled to input size (exactly what
        # BiSeNet.__call__ would do to it); the other two heads' CE fuses
        # the upsample via ops/pallas/fused_ce.py so their full-res logits
        # never materialize fwd or bwd (on TPU; the fallback is the
        # mathematically identical resize-then-CE).
        return g_model.apply({"params": params, "batch_stats": stats},
                             x, train=True, mutable=["batch_stats"],
                             method=type(g_model).features)

    def d_apply(params, stats, x):
        return d_model.apply({"params": params, "batch_stats": stats},
                             x, train=True, mutable=["batch_stats"])

    def step(g_state: TrainState, d_state: TrainState,
             src_images, src_labels, tgt_images, lr_g, lr_d):
        from ..ops.pallas.fused_ce import cross_entropy_upsampled

        hw = src_images.shape[1:3]

        # ---- phase 1: G segmentation update on source ------------------
        def seg_loss_fn(params):
            feats, mutated = g_apply_feats(params, g_state.batch_stats,
                                           src_images)
            up_head = resize_bilinear_align_corners(feats[d_head], hw)
            # same per-head summation order as the reference train.py:214-217
            head_losses = [
                cross_entropy_ignore(up_head, src_labels, ignore_index)
                if i == d_head else
                cross_entropy_upsampled(f, src_labels, hw, ignore_index)
                for i, f in enumerate(feats)]
            loss = head_losses[0] + head_losses[1] + head_losses[2]
            return loss, (mutated["batch_stats"], up_head)

        (seg_loss, (g_stats1, up_src)), g_grads = jax.value_and_grad(
            seg_loss_fn, has_aux=True)(g_state.params)
        g_grads = reduce(g_grads)
        g_opt = set_learning_rate(g_state.opt_state, lr_g)
        upd, g_opt = g_optimizer.update(g_grads, g_opt, g_state.params)
        g_params1 = jax.tree.map(lambda p, u: p + u, g_state.params, upd)

        # ---- phase 2: G adversarial update on target -------------------
        def adv_loss_fn(params):
            feats_t, g_mut = g_apply_feats(params, g_stats1, tgt_images)
            up_t = resize_bilinear_align_corners(feats_t[d_head],
                                                 tgt_images.shape[1:3])
            probs_t = jax.nn.softmax(up_t.astype(jnp.float32), axis=-1)
            d_out, d_mut = d_apply(d_state.params, d_state.batch_stats,
                                   probs_t)
            loss = bce_with_logits(d_out, SOURCE_LABEL) * lambda_adv
            return loss, (g_mut["batch_stats"], d_mut["batch_stats"],
                          up_t)

        (loss_d1, (g_stats2, d_stats1, up_tgt)), g_grads2 = \
            jax.value_and_grad(adv_loss_fn, has_aux=True)(g_params1)
        g_grads2 = reduce(g_grads2)
        upd2, g_opt = g_optimizer.update(g_grads2, g_opt, g_params1)
        g_params2 = jax.tree.map(lambda p, u: p + u, g_params1, upd2)

        new_g_state = TrainState(params=g_params2, batch_stats=g_stats2,
                                 opt_state=g_opt, step=g_state.step + 1)

        # Detached softmax maps (reference train.py:243-244).
        probs_src = jax.lax.stop_gradient(
            jax.nn.softmax(up_src.astype(jnp.float32), axis=-1))
        probs_tgt = jax.lax.stop_gradient(
            jax.nn.softmax(up_tgt.astype(jnp.float32), axis=-1))

        # ---- phase 3: D update on source (label 0) ---------------------
        def d_src_loss_fn(params):
            d_out, d_mut = d_apply(params, d_stats1, probs_src)
            return bce_with_logits(d_out, SOURCE_LABEL), \
                d_mut["batch_stats"]

        (loss_adv_src, d_stats2), d_grads = jax.value_and_grad(
            d_src_loss_fn, has_aux=True)(d_state.params)
        d_grads = reduce(d_grads)
        d_opt = set_learning_rate(d_state.opt_state, lr_d)
        d_upd, d_opt = d_optimizer.update(d_grads, d_opt, d_state.params)
        d_params1 = jax.tree.map(lambda p, u: p + u, d_state.params, d_upd)

        # ---- phase 4: D update on target (label 1) ---------------------
        def d_tgt_loss_fn(params):
            d_out, d_mut = d_apply(params, d_stats2, probs_tgt)
            return bce_with_logits(d_out, TARGET_LABEL), \
                d_mut["batch_stats"]

        (loss_adv_tgt, d_stats3), d_grads2 = jax.value_and_grad(
            d_tgt_loss_fn, has_aux=True)(d_params1)
        d_grads2 = reduce(d_grads2)
        d_upd2, d_opt = d_optimizer.update(d_grads2, d_opt, d_params1)
        d_params2 = jax.tree.map(lambda p, u: p + u, d_params1, d_upd2)

        new_d_state = TrainState(params=d_params2, batch_stats=d_stats3,
                                 opt_state=d_opt, step=d_state.step + 1)

        metrics = {
            "loss": seg_loss,                      # train.py:217
            "loss_D1": loss_d1,                    # train.py:234
            "loss_G": seg_loss + loss_d1,          # train.py:264
            "loss_adv": loss_adv_src + loss_adv_tgt,  # train.py:265
        }
        return new_g_state, new_d_state, reduce(metrics)

    def step_combined(g_state: TrainState, d_state: TrainState,
                      src_images, src_labels, tgt_images, lr_g, lr_d):
        """Reference train_nni.py:105-163: one zero_grad per optimizer,
        four accumulated backwards, one step per optimizer."""
        from ..ops.pallas.fused_ce import cross_entropy_upsampled

        hw = src_images.shape[1:3]

        # ---- G: grad(seg_src) + grad(lambda*adv_tgt), BOTH forwards at
        # the initial weights, accumulated into one SGD update
        # (train_nni.py:116-141 backwards, :161 scaler.step(optimizer)) --
        def g_loss_fn(params):
            feats_s, mut_s = g_apply_feats(params, g_state.batch_stats,
                                           src_images)
            up_src = resize_bilinear_align_corners(feats_s[d_head], hw)
            # per-head summation order as train_nni.py:122-125
            head_losses = [
                cross_entropy_ignore(up_src, src_labels, ignore_index)
                if i == d_head else
                cross_entropy_upsampled(f, src_labels, hw, ignore_index)
                for i, f in enumerate(feats_s)]
            seg_loss = head_losses[0] + head_losses[1] + head_losses[2]
            # target forward continues from the source forward's BN stats
            # (same module called twice in train mode, train_nni.py:120,134)
            feats_t, mut_t = g_apply_feats(params, mut_s["batch_stats"],
                                           tgt_images)
            up_t = resize_bilinear_align_corners(feats_t[d_head],
                                                 tgt_images.shape[1:3])
            probs_t = jax.nn.softmax(up_t.astype(jnp.float32), axis=-1)
            # D params are closure constants: gradients flow through D's
            # activations to G but never reach D -- requires_grad=False
            # (train_nni.py:109-110) in functional form
            d_out, d_mut = d_apply(d_state.params, d_state.batch_stats,
                                   probs_t)
            loss_d1 = bce_with_logits(d_out, SOURCE_LABEL) * lambda_adv
            return seg_loss + loss_d1, (
                mut_t["batch_stats"], d_mut["batch_stats"], up_src, up_t,
                seg_loss, loss_d1)

        (_, (g_stats, d_stats1, up_src, up_tgt, seg_loss, loss_d1)), \
            g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_state.params)
        g_grads = reduce(g_grads)
        g_opt = set_learning_rate(g_state.opt_state, lr_g)
        upd, g_opt = g_optimizer.update(g_grads, g_opt, g_state.params)
        g_params = jax.tree.map(lambda p, u: p + u, g_state.params, upd)
        new_g_state = TrainState(params=g_params, batch_stats=g_stats,
                                 opt_state=g_opt, step=g_state.step + 1)

        # Detached softmax maps (train_nni.py:146-147).
        probs_src = jax.lax.stop_gradient(
            jax.nn.softmax(up_src.astype(jnp.float32), axis=-1))
        probs_tgt = jax.lax.stop_gradient(
            jax.nn.softmax(up_tgt.astype(jnp.float32), axis=-1))

        # ---- D: grad(BCE_src@0) + grad(BCE_tgt@1), both forwards at the
        # OLD D weights, one Adam update (train_nni.py:149-159 backwards,
        # :162 scaler.step(optimizer_D1)). BN stats still update in call
        # order: adv (d_stats1) -> src -> tgt. --------------------------
        def d_loss_fn(params):
            o_src, m_src = d_apply(params, d_stats1, probs_src)
            l_src = bce_with_logits(o_src, SOURCE_LABEL)
            o_tgt, m_tgt = d_apply(params, m_src["batch_stats"], probs_tgt)
            l_tgt = bce_with_logits(o_tgt, TARGET_LABEL)
            return l_src + l_tgt, (m_tgt["batch_stats"], l_src, l_tgt)

        (_, (d_stats, loss_adv_src, loss_adv_tgt)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        d_grads = reduce(d_grads)
        d_opt = set_learning_rate(d_state.opt_state, lr_d)
        d_upd, d_opt = d_optimizer.update(d_grads, d_opt, d_state.params)
        d_params = jax.tree.map(lambda p, u: p + u, d_state.params, d_upd)
        new_d_state = TrainState(params=d_params, batch_stats=d_stats,
                                 opt_state=d_opt, step=d_state.step + 1)

        metrics = {
            "loss": seg_loss,                         # train_nni.py:125
            "loss_D1": loss_d1,                       # train_nni.py:138
            "loss_G": seg_loss + loss_d1,             # train_nni.py:165
            "loss_adv": loss_adv_src + loss_adv_tgt,  # train_nni.py:166
        }
        return new_g_state, new_d_state, reduce(metrics)

    if step_mode == "combined":
        step = step_combined
    if not jit:
        return step
    donate_args = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def train_da(args, g_model, d_model, g_state, d_state, g_optimizer,
             d_optimizer, loader_source, loader_target, *,
             prepare_source, prepare_target, evaluate_fn, writer=None,
             logger=None, checkpoint_fn: Optional[Callable] = None,
             d_head: int = 0, profiler=None,
             report_fn: Optional[Callable] = None, da_step=None,
             step_mode: str = "interleaved", lr_mode: str = "reference"):
    """Epoch loop (reference train.py:176-299).

    report_fn(epoch, miou): called after every validation -- the HPO
    trial's per-epoch intermediate-result hook (reference
    train_nni.py:194 reports mIoU to the tuner at each validation epoch).
    da_step: override the default jitted step (the per-replica-BN
    data-parallel variant, parallel.mesh.make_sharded_da_step).
    step_mode: forwarded to make_da_step ('interleaved' | 'combined').
    lr_mode: 'reference' = train.py:185-186 (each optimizer compounds its
    own poly schedule); 'nni_faithful' = the NNI trial's ACTUAL LR
    dataflow (train_nni.py:97-98): both poly_lr_scheduler calls there
    mutate ``optimizer`` (the generator's), so G follows the compounded
    poly of learning_rate_D (the second call overwrites the first) and D
    trains at a CONSTANT learning_rate_D -- a reference bug kept
    reproducible for trajectory-parity oracles; the fixed behavior is
    'reference'.
    """
    if da_step is None:
        da_step = make_da_step(g_model, d_model, g_optimizer, d_optimizer,
                               lambda_adv=args.lambda_adv_target1,
                               d_head=d_head, step_mode=step_mode)
    if lr_mode == "nni_faithful":
        from ..ops.schedules import ConstantLR

        sched_g = PolyLR(args.learning_rate_D, args.num_epochs,
                         mode="compounding")  # train_nni.py:98 hits G
        sched_d = ConstantLR(args.learning_rate_D)  # D never decayed
    elif lr_mode == "reference":
        # compounding poly LR: reference train.py:185-186
        sched_g = PolyLR(args.learning_rate, args.num_epochs,
                         mode="compounding")
        sched_d = PolyLR(args.learning_rate_D, args.num_epochs,
                         mode="compounding")
    else:
        raise ValueError(f"unknown lr_mode: {lr_mode!r}")
    epoch_start = getattr(args, "epoch_start_i", 0)
    # a resumed run must continue the compounded schedule, not restart it
    sched_g.fast_forward(epoch_start)
    sched_d.fast_forward(epoch_start)
    max_miou = 0.0
    step_count = 0

    for epoch in range(epoch_start, args.num_epochs):
        lr_g = sched_g(epoch)
        lr_d = sched_d(epoch)
        loader_source.set_epoch(epoch)
        loader_target.set_epoch(epoch)
        seg_losses, adv_losses, step_losses = [], [], []
        t0 = time.time()
        n_images = 0
        max_steps = getattr(args, "max_steps_per_epoch", None)

        def prepared_batches():
            # 2-deep eager lookahead; see train/supervised.py.
            for it_, (src_b, tgt_b) in enumerate(
                    zip(loader_source, loader_target)):
                if max_steps is not None and it_ >= max_steps:
                    break
                src_i, src_l = prepare_source(src_b, epoch, it_)
                tgt_i, _ = prepare_target(tgt_b, epoch, it_)
                yield src_i, src_l, tgt_i

        from ..data.pipeline import device_prefetch

        for it, (src_images, src_labels, tgt_images) in enumerate(
                device_prefetch(prepared_batches(), depth=2,
                                transfer_timeout=getattr(
                                    args, "fetch_timeout", 900.0))):
            g_state, d_state, metrics = da_step(
                g_state, d_state, src_images, src_labels, tgt_images,
                lr_g, lr_d)
            if profiler is not None:
                profiler.step()
            step_count += 1
            n_images += src_images.shape[0]
            seg_losses.append(metrics["loss_G"])
            adv_losses.append(metrics["loss_adv"])
            if writer is not None:
                step_losses.append(metrics["loss"])
        jax.block_until_ready(g_state.params)
        dt = time.time() - t0
        # ONE host readback per epoch (see train/supervised.py): per-step
        # float(metrics[...]) would sync the device every step; the
        # per-step TB scalars flush from stacked readbacks instead.
        seg_h = (np.asarray(jnp.stack(seg_losses)) if seg_losses
                 else np.zeros(0, np.float32))
        adv_h = (np.asarray(jnp.stack(adv_losses)) if adv_losses
                 else np.zeros(0, np.float32))
        if writer is not None and step_losses:
            step_h = np.asarray(jnp.stack(step_losses))
            first_step = step_count - len(step_losses) + 1
            for i in range(len(step_losses)):
                writer.add_scalar("loss_step", float(step_h[i]),
                                  first_step + i)
                writer.add_scalar("loss_G", float(seg_h[i]), first_step + i)
                writer.add_scalar("loss_adv", float(adv_h[i]),
                                  first_step + i)
        mean_g = float(seg_h.mean()) if seg_losses else 0.0
        mean_d = float(adv_h.mean()) if adv_losses else 0.0
        print("iter = {0:1d}/{1}, loss_seg = {2:.3f} loss_D1 = {3:.3f}"
              .format(epoch, args.num_epochs, mean_g, mean_d))
        if logger is not None:
            logger.log(epoch=epoch, lr_g=lr_g, lr_d=lr_d, loss_seg=mean_g,
                       loss_adv=mean_d,
                       images_per_sec=n_images / max(dt, 1e-9))

        if epoch % args.checkpoint_step == 0 and epoch != 0 \
                and checkpoint_fn is not None:
            # reference names: GTA5_<checkpoint_step>.pth + _D1.pth with
            # module. prefix (train.py:280-283)
            checkpoint_fn(g_state, f"GTA5_{args.checkpoint_step}",
                          dataparallel_prefix=True, epoch=epoch)
            checkpoint_fn(d_state, f"GTA5_{args.checkpoint_step}_D1",
                          dataparallel_prefix=True, model="discriminator",
                          epoch=epoch)

        if epoch % args.validation_step == 0 and epoch != 0:
            precision, miou = evaluate_fn(g_state)
            if report_fn is not None:
                report_fn(epoch, miou)
            if miou > max_miou:
                max_miou = miou
                if checkpoint_fn is not None:
                    # save BOTH nets: a best-save updates G's 'latest'
                    # alias and the shared EPOCH marker, so leaving D
                    # behind would make --resume restore an incoherent
                    # G/D pair (G at the best epoch, D at the last
                    # checkpoint_step epoch). The reference writes only
                    # best.pth (train.py:285-293); best_D1 is the resume
                    # capability's coherence requirement.
                    checkpoint_fn(g_state, "best", epoch=epoch)
                    checkpoint_fn(d_state, "best_D1",
                                  model="discriminator", epoch=epoch)
            if writer is not None:
                writer.add_scalar("epoch/precision_val", precision, epoch)
                writer.add_scalar("epoch/miou val", miou, epoch)

    n_d_params = sum(int(x.size) for x in jax.tree.leaves(d_state.params))
    print("The discriminator has: ", n_d_params)  # train.py:295-299
    return g_state, d_state, max_miou
