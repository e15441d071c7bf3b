"""THE end-to-end eval-parity oracle (VERDICT round-2 item #1).

Runs the REFERENCE's actual evaluation code (train.py:24-61 val() +
dataset/cityscapes.py CityScapes + utils.py metrics, imported from
/root/reference and executed under torch CPU) over a synthetic Cityscapes
tree with a checkpoint exported by our writer, then runs OUR CLI
`--domain_shift` over the same tree + checkpoint, and asserts the two
frameworks report the SAME precision and mIoU.

This is one number produced by both frameworks through their WHOLE
pipelines — directory scan -> sorted pairing -> decode -> (faithful
transposed) PIL resize -> normalize -> forward -> argmax ->
fast_hist/per_class_iu + the accuracy-counts-255-as-wrong quirk — and is
the strongest buildable proxy for the blocked real-Cityscapes parity runs
(PARITY_RUNBOOK.md; tools/reference_eval.py is the same harness pointed at
real data).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dasemanticsegmentationaml_tpu import cli
from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables,
)
from dasemanticsegmentationaml_tpu.utils.torch_io import (
    variables_to_torch_state,
    write_torch_checkpoint,
)

# Source images bigger than the crop so the (transposed, faithful) PIL
# bilinear/nearest resize path is genuinely exercised on both sides.
SRC_H, SRC_W = 96, 192
CROP_H, CROP_W = 64, 128


def _mk_val_tree(root, n=3):
    from PIL import Image

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(root, "images", "val", "city"), exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", "val", "city"), exist_ok=True)
    for i in range(n):
        # smooth-ish image: low-res noise upsampled, so predictions have
        # spatial structure rather than pure pixel noise
        base = rng.integers(0, 255, (12, 24, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize((SRC_W, SRC_H),
                                                    Image.BILINEAR))
        Image.fromarray(img).save(
            os.path.join(root, "images", "val", "city", f"c_{i:03d}.png"))
        lab = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
        # sprinkle ignore pixels: exercises the 255-masked mIoU vs the
        # 255-counted-wrong accuracy quirk (reference utils.py:151-172)
        lab[rng.random((SRC_H, SRC_W)) < 0.1] = 255
        Image.fromarray(lab, mode="L").save(
            os.path.join(root, "gtFine", "val", "city",
                         f"c_{i:03d}_labelTrainIds.png"))


def _export_checkpoint(path, logit_scale=8.0, seed=0):
    """Random-init our fp32 BiSeNet, scale the three head output convs by
    `logit_scale` (widens argmax margins so the oracle is not a coin-flip
    on sub-1e-5 cross-framework fp differences at near-tied pixels — the
    pipelines under test are unaffected), export as a reference-named .pth.
    """
    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(seed),
                                       (1, CROP_H, CROP_W, 3))
    params = jax.device_get(variables)
    state = variables_to_torch_state(params)
    for k in list(state):
        if "conv_out" in k and k.endswith(("conv.weight", "conv.bias")) \
                and "conv_out" in k.split(".")[0]:
            state[k] = state[k] * logit_scale
    write_torch_checkpoint(path, state)
    return state


@requires_reference
def test_domain_shift_miou_equals_reference_val(tmp_path):
    from reference_eval import run_reference_val

    root = str(tmp_path / "cs")
    _mk_val_tree(root)
    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt)

    ref_precision, ref_miou = run_reference_val(
        root, ckpt, CROP_H, CROP_W, num_classes=19)

    result = cli.main([
        "--root", root, "--dataset", "Cityspaces",
        "--domain_shift", "True", "--pretrain_path", ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--save_model_path", str(tmp_path / "ck"),
    ])

    assert ref_miou > 0.0  # non-degenerate oracle
    assert abs(result["miou"] - ref_miou) <= 1e-6, (
        f"mIoU mismatch: ours {result['miou']!r} vs reference {ref_miou!r}")
    assert abs(result["precision"] - ref_precision) <= 1e-6, (
        f"precision mismatch: ours {result['precision']!r} "
        f"vs reference {ref_precision!r}")


def _mk_gtav_tree(root, n=6):
    """Flat GTA5 tree with RAW 0..34 ids in palettized labels, sources
    larger than the crop (exercises remap + the transposed resize)."""
    from PIL import Image

    rng = np.random.default_rng(11)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(n):
        base = rng.integers(0, 255, (12, 24, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize((SRC_W, SRC_H),
                                                    Image.BILINEAR))
        Image.fromarray(img).save(
            os.path.join(root, "images", f"{i:05d}.png"))
        lab = Image.fromarray(
            rng.integers(0, 35, (SRC_H, SRC_W), dtype=np.uint8), mode="P")
        lab.putpalette(rng.integers(0, 256, 768, dtype=np.uint8).tolist())
        lab.save(os.path.join(root, "labels", f"{i:05d}.png"))


@requires_reference
def test_gtav_domain_shift_miou_equals_reference_val(tmp_path):
    """The OTHER eval pipeline end-to-end: reference --dataset GTAV
    --domain_shift (75/25 split -> val() over the val quarter with the
    in-getitem 34->19 remap, GTAV.py:97-100 + train.py:453-476) must
    equal our CLI's GTAV domain-shift number (device LUT remap,
    bit-identical sklearn-free split)."""
    from reference_eval import run_reference_val_gtav

    root = str(tmp_path / "gta")
    _mk_gtav_tree(root)
    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt, seed=3)

    ref_precision, ref_miou = run_reference_val_gtav(
        root, ckpt, CROP_H, CROP_W, num_classes=19)

    result = cli.main([
        "--root", root, "--dataset", "GTAV",
        "--domain_shift", "True", "--pretrain_path", ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--save_model_path", str(tmp_path / "ck"),
    ])

    assert ref_miou > 0.0
    assert abs(result["miou"] - ref_miou) <= 1e-6, (
        f"mIoU mismatch: ours {result['miou']!r} vs reference {ref_miou!r}")
    assert abs(result["precision"] - ref_precision) <= 1e-6, (
        f"precision mismatch: ours {result['precision']!r} "
        f"vs reference {ref_precision!r}")


@requires_reference
def test_supervised_train_losses_match_reference_train(tmp_path, capsys):
    """The TRAINING analogue of the eval oracle: the reference's ACTUAL
    train() (train.py:63-120 — autocast/GradScaler wrapping, per-epoch
    poly LR, 3-head CE sum, SGD(momentum=0.9, wd=1e-4) as main() builds
    it) runs over a synthetic tree from a shared init checkpoint, and our
    CLI's per-epoch mean train-loss sequence must track it.

    batch_size == len(train set): one step per epoch, so torch's shuffle
    order is irrelevant (batch means and BN stats are permutation-
    invariant) and the trajectories are directly comparable. Tolerances
    are update-relative-noise-calibrated (test_train_equivalence.py:
    cross-framework fp32 conv algorithms differ at ~1e-4 of activation
    scale and compound per step): epoch 1 is pre-divergence, later epochs
    include one update's worth of drift each.
    """
    from reference_eval import run_reference_train_supervised

    root = str(tmp_path / "cs")
    _mk_val_tree(root)                      # val tree (n=3)
    # train tree: 4 images so batch_size=4 is one step per epoch
    from PIL import Image

    rng = np.random.default_rng(23)
    os.makedirs(os.path.join(root, "images", "train", "city"),
                exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", "train", "city"),
                exist_ok=True)
    for i in range(4):
        base = rng.integers(0, 255, (12, 24, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize((SRC_W, SRC_H),
                                                    Image.BILINEAR))
        Image.fromarray(img).save(
            os.path.join(root, "images", "train", "city",
                         f"t_{i:03d}.png"))
        lab = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
        lab[rng.random((SRC_H, SRC_W)) < 0.1] = 255
        Image.fromarray(lab, mode="L").save(
            os.path.join(root, "gtFine", "train", "city",
                         f"t_{i:03d}_labelTrainIds.png"))

    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt, logit_scale=1.0, seed=5)
    epochs = 3

    # lr well above the reference default so the trajectory MOVES (random
    # labels barely descend at 0.01); the tracking asserts then have
    # power: a semantics bug (LR schedule, zero_grad, head weighting, BN
    # update) shifts epoch 2-3 far beyond the fp noise envelope
    lr = 0.1
    ref_losses, ref_precision, ref_miou = run_reference_train_supervised(
        root, ckpt, CROP_H, CROP_W, num_epochs=epochs, batch_size=4,
        learning_rate=lr, workdir=str(tmp_path))

    result = cli.main([
        "--root", root, "--dataset", "Cityspaces",
        "--pretrain_path", ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--batch_size", "4", "--num_epochs", str(epochs),
        "--learning_rate", str(lr), "--optimizer", "sgd",
        "--checkpoint_step", "1", "--validation_step", "1",
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--save_model_path", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    import re

    our_losses = [float(m) for m in
                  re.findall(r"loss for train : ([0-9.eE+-]+)", out)]
    assert len(our_losses) == epochs

    # epoch 1: identical inputs, zero accumulated drift — conv-algorithm
    # noise only; later epochs compound one update of divergence each
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-2)
    # per-epoch loss DELTAS are the sensitive signal (a schedule /
    # zero_grad / BN-update bug changes the descent direction, not the
    # 9.x CE offset): each epoch's movement must track within 25%
    np.testing.assert_allclose(np.diff(our_losses), np.diff(ref_losses),
                               rtol=0.25)
    # and that movement dwarfs the epoch-1 cross-framework noise floor
    spread = max(ref_losses) - min(ref_losses)
    assert spread > 50 * 1e-4 * ref_losses[0], (ref_losses, spread)
    # end-state val numbers from each framework's own full eval pipeline
    assert abs(result["precision"] - ref_precision) <= 2e-2
    assert abs(result["miou"] - ref_miou) <= 2e-2


@requires_reference
def test_da_train_losses_match_reference_train_da(tmp_path, capsys):
    """The DA analogue: the reference's ACTUAL train_DA (train.py:134-299
    — internal D construction, internal GtaV/CityScapes loaders, SGD-G +
    Adam-D, 4-phase step with λ_adv, compounding per-epoch poly LR) runs
    from a shared G checkpoint and a captured random D init, and our
    CLI's per-epoch (loss_seg, loss_D1) sequences must track it.

    D init is shared through the new --d_pretrain_path flag (the
    reference's D is born inside train_DA; the harness captures the same
    torch-seeded init). batch_size == len(source) == len(target): one
    zip'd step per epoch, shuffle-order invariant.
    """
    import re

    from reference_eval import run_reference_train_da

    src = str(tmp_path / "gta")
    _mk_gtav_tree(src, n=4)
    tgt = str(tmp_path / "cs")
    _mk_val_tree(tgt)                       # val tree under the same root
    from PIL import Image

    rng = np.random.default_rng(31)
    os.makedirs(os.path.join(tgt, "images", "train", "city"), exist_ok=True)
    os.makedirs(os.path.join(tgt, "gtFine", "train", "city"), exist_ok=True)
    for i in range(4):
        base = rng.integers(0, 255, (12, 24, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize((SRC_W, SRC_H),
                                                    Image.BILINEAR))
        Image.fromarray(img).save(
            os.path.join(tgt, "images", "train", "city", f"t_{i:03d}.png"))
        lab = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
        Image.fromarray(lab, mode="L").save(
            os.path.join(tgt, "gtFine", "train", "city",
                         f"t_{i:03d}_labelTrainIds.png"))

    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt, logit_scale=1.0, seed=9)
    epochs = 3

    d_init, ref_losses, ref_precision, ref_miou, ref_d_params = \
        run_reference_train_da(
            src, tgt, tgt, ckpt, CROP_H, CROP_W, num_epochs=epochs,
            batch_size=4, workdir=str(tmp_path), depthwise=True,
            batch_norm=True, d_seed=3)

    d_ckpt = str(tmp_path / "d_init.pth")
    from dasemanticsegmentationaml_tpu.utils.torch_io import (
        write_torch_checkpoint,
    )

    write_torch_checkpoint(d_ckpt,
                           {k: np.asarray(v) for k, v in d_init.items()})

    result = cli.main([
        "--root", tgt, "--root_source", src, "--root_target", tgt,
        "--dataset", "Cityspaces", "--domain_adaptation", "True",
        "--depthwise", "True", "--batch_norm", "True",
        "--pretrain_path", ckpt, "--d_pretrain_path", d_ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--batch_size", "4", "--num_epochs", str(epochs),
        "--checkpoint_step", "1", "--validation_step", "1",
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--save_model_path", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    our_losses = [(float(a), float(b)) for a, b in re.findall(
        r"loss_seg = ([0-9.eE+-]+) loss_D1 = ([0-9.eE+-]+)", out)]
    assert len(our_losses) == epochs
    (our_d_params,) = re.findall(r"The discriminator has:\s+(\d+)", out)
    assert int(our_d_params) == ref_d_params == 193194

    ours = np.array(our_losses)
    refs = np.array(ref_losses)
    # epoch 1 from identical states: fp envelope + the 3-decimal print
    # rounding (5e-4 each side)
    np.testing.assert_allclose(ours[0], refs[0], rtol=1e-3, atol=1.5e-3)
    # full trajectories (seg ~9.x, adv ~1.4) within the compounding
    # cross-framework conv-noise envelope
    np.testing.assert_allclose(ours, refs, rtol=2e-2, atol=2e-3)
    # end-state val from each framework's own full pipeline
    assert abs(result["precision"] - ref_precision) <= 2e-2
    assert abs(result["miou"] - ref_miou) <= 2e-2


@requires_reference
def test_nni_trial_losses_match_reference_train_nni(tmp_path, capsys):
    """The NNI-trial analogue: the reference's ACTUAL train_nni.py
    train_DA (:58-195 — always-FCDiscriminator, D consumes out32, single
    zero_grad + four accumulated backwards + ONE step per optimizer, and
    the :97-98 LR dataflow where G follows lr_D's compounded poly while
    D's LR never decays) runs from a shared G checkpoint and a captured
    random D init, and our CLI in `--da_step_mode combined
    --nni_faithful_lr True` mode must track its per-epoch
    (loss_G, loss_adv) sequences.

    learning_rate is set to an absurd 3.3 on BOTH sides: the reference's
    LR bug means it is never applied (it only feeds the tqdm
    description), so if our faithful mode wrongly used it anywhere the
    trajectory would explode far beyond any tolerance. The update
    ordering has the discriminating power for step_mode: under the
    interleaved 4-phase step the target G forward runs at once-updated
    weights and D's target forward at once-updated D, which shifts
    epoch-1 losses beyond the fp envelope at these LRs.
    """
    import re

    from reference_eval import run_reference_train_da_nni

    src = str(tmp_path / "gta")
    _mk_gtav_tree(src, n=4)
    tgt = str(tmp_path / "cs")
    _mk_val_tree(tgt)
    from PIL import Image

    rng = np.random.default_rng(41)
    os.makedirs(os.path.join(tgt, "images", "train", "city"), exist_ok=True)
    os.makedirs(os.path.join(tgt, "gtFine", "train", "city"), exist_ok=True)
    for i in range(4):
        base = rng.integers(0, 255, (12, 24, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize((SRC_W, SRC_H),
                                                    Image.BILINEAR))
        Image.fromarray(img).save(
            os.path.join(tgt, "images", "train", "city", f"t_{i:03d}.png"))
        lab = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
        Image.fromarray(lab, mode="L").save(
            os.path.join(tgt, "gtFine", "train", "city",
                         f"t_{i:03d}_labelTrainIds.png"))

    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt, logit_scale=1.0, seed=13)
    epochs = 3
    lr_ignored = 3.3     # never applied (train_nni.py:97 overwritten by :98)
    # G's REAL schedule base + D's constant Adam LR. Hot enough that one
    # Adam step visibly moves D (epoch-1 loss_adv discriminates combined
    # vs interleaved: interleaved's target-D forward sees a once-stepped
    # D), but below the exploding-BCE regime (0.05 measured: loss_adv
    # reaches 2.5e5 by epoch 3 and chaotic amplification pushes the
    # cross-framework envelope to ~8%)
    lr_d = 0.01

    d_init, ref_losses, ref_precision, ref_miou, ref_intermediates = \
        run_reference_train_da_nni(
            src, tgt, tgt, ckpt, CROP_H, CROP_W, num_epochs=epochs,
            batch_size=4, workdir=str(tmp_path),
            learning_rate=lr_ignored, learning_rate_d=lr_d, d_seed=17)
    # harness sanity: one intermediate report per validated epoch
    # (train_nni.py:185,194 — epochs 1..N-1)
    assert len(ref_intermediates) == epochs - 1

    d_ckpt = str(tmp_path / "d_init.pth")
    from dasemanticsegmentationaml_tpu.utils.torch_io import (
        write_torch_checkpoint,
    )

    write_torch_checkpoint(d_ckpt,
                           {k: np.asarray(v) for k, v in d_init.items()})

    result = cli.main([
        "--root", tgt, "--root_source", src, "--root_target", tgt,
        "--dataset", "Cityspaces", "--domain_adaptation", "True",
        "--depthwise", "False", "--batch_norm", "False",
        "--d_head", "2", "--da_step_mode", "combined",
        "--nni_faithful_lr", "True",
        "--learning_rate", str(lr_ignored),
        "--learning_rate_D", str(lr_d),
        "--pretrain_path", ckpt, "--d_pretrain_path", d_ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--batch_size", "4", "--num_epochs", str(epochs),
        "--checkpoint_step", "1", "--validation_step", "1",
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--save_model_path", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    our_losses = [(float(a), float(b)) for a, b in re.findall(
        r"loss_seg = ([0-9.eE+-]+) loss_D1 = ([0-9.eE+-]+)", out)]
    assert len(our_losses) == epochs
    (our_d_params,) = re.findall(r"The discriminator has:\s+(\d+)", out)
    assert int(our_d_params) == 2781121  # FCDiscriminator (SURVEY §2.1)

    ours = np.array(our_losses)
    refs = np.array(ref_losses)
    # epoch 1 from identical states: fp envelope + 3-decimal print rounding
    np.testing.assert_allclose(ours[0], refs[0], rtol=1e-3, atol=1.5e-3)
    # full trajectories within the compounding cross-framework envelope
    # (Adam's sign-like steps amplify fp noise faster than SGD's)
    np.testing.assert_allclose(ours, refs, rtol=5e-2, atol=4e-3)
    # end-state val from each framework's own full pipeline
    assert abs(result["precision"] - ref_precision) <= 2e-2
    assert abs(result["miou"] - ref_miou) <= 2e-2


@requires_reference
def test_reference_val_harness_is_deterministic(tmp_path):
    """The oracle itself must be stable run-to-run (same tree, same ckpt)."""
    from reference_eval import run_reference_val

    root = str(tmp_path / "cs")
    _mk_val_tree(root, n=2)
    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt, seed=1)
    a = run_reference_val(root, ckpt, CROP_H, CROP_W)
    b = run_reference_val(root, ckpt, CROP_H, CROP_W)
    assert a == b


@requires_reference
def test_int8_head_ch_parity_through_oracle(tmp_path):
    """Qualify the measured-best int8 preset (head_ch, +5.1% img/s on chip)
    against the reference oracle: the quantized CLI's mIoU over the same
    tree + checkpoint must stay within 0.005 of the reference fp32 val()
    (the real-data bar is 0.5 mIoU points; this synthetic bar is 100x
    tighter). VERDICT round-2 item #5."""
    from reference_eval import run_reference_val

    root = str(tmp_path / "cs")
    _mk_val_tree(root)
    ckpt = str(tmp_path / "export.pth")
    _export_checkpoint(ckpt)

    _, ref_miou = run_reference_val(root, ckpt, CROP_H, CROP_W)

    result = cli.main([
        "--root", root, "--dataset", "Cityspaces",
        "--domain_shift", "True", "--pretrain_path", ckpt,
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--dtype", "float32", "--use_fused_eval", "False",
        "--faithful_resize", "True", "--tensorboard", "False",
        "--num_workers", "1", "--num_devices", "1",
        "--eval_batch_size", "1",
        "--quantize_int8", "True", "--quantize_filter", "head_ch",
        "--save_model_path", str(tmp_path / "ck"),
    ])
    assert abs(result["miou"] - ref_miou) <= 5e-3, (
        f"int8 head_ch mIoU drift: {result['miou']!r} vs {ref_miou!r}")
