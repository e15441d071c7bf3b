"""Tests for --resume (true train-state resume, absent in the reference),
the legacy label-tool surface (reference utils.py:29-254), group_weight
(utils.py:273-295), and the two-level DCN mesh (SURVEY.md section 5.8)."""

import os

import numpy as np
import pytest

from tests.test_cli import COMMON, H, W, _mk_cityscapes


def test_cli_resume_continues_training(tmp_path):
    from dasemanticsegmentationaml_tpu import cli

    root = str(tmp_path / "cs")
    _mk_cityscapes(root, "train")
    _mk_cityscapes(root, "val", n=2)
    save = str(tmp_path / "ckpt")
    cli.main(COMMON + [
        "--root", root, "--save_model_path", save,
    ])
    orbax_dir = os.path.join(save, "orbax")
    assert os.path.isdir(os.path.join(orbax_dir, "latest"))
    assert os.path.exists(os.path.join(orbax_dir, "EPOCH"))

    # resume for two more epochs; epoch counter continues from the marker
    result = cli.main(COMMON + [
        "--root", root, "--save_model_path", save,
        "--resume", orbax_dir, "--num_epochs", "4",
    ])
    assert np.isfinite(result["miou"])


def test_group_weight_mask():
    import jax
    from dasemanticsegmentationaml_tpu.train.optim import group_weight_mask

    params = {
        "conv": {"kernel": np.zeros((3, 3, 8, 16)), "bias": np.zeros(16)},
        "bn": {"scale": np.zeros(16), "bias": np.zeros(16)},
    }
    mask = group_weight_mask(jax.tree.map(np.asarray, params))
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False
    assert mask["bn"]["bias"] is False


def test_group_weight_matches_reference_literal_function():
    """Imports and EXECUTES the reference's actual ``group_weight``
    (/root/reference/utils.py:273-295) on a real reference module
    (DepthWiseSepBNFCDiscriminator: convs with biases + BNs) plus a
    Linear-bearing module, and asserts our rank>=2 mask rule
    (train/optim.py group_weight_mask) reproduces its per-parameter
    decay/no-decay decision exactly (VERDICT r3 missing #4)."""
    import sys

    from conftest import has_reference, has_torch

    if not (has_reference() and has_torch()):
        import pytest

        pytest.skip("reference repo or torch unavailable")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import reference_eval

    reference_eval._install_torchvision_stub()  # utils.py imports torchvision
    if reference_eval.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, reference_eval.REFERENCE_ROOT)
    import torch.nn as nn
    from model.discriminator import DepthWiseSepBNFCDiscriminator
    from utils import group_weight  # /root/reference/utils.py

    from dasemanticsegmentationaml_tpu.train.optim import group_weight_mask

    modules = {
        "dw_bn_discriminator": DepthWiseSepBNFCDiscriminator(num_classes=19),
        "conv_bn_linear": nn.Sequential(
            nn.Conv2d(3, 8, 3, bias=True), nn.BatchNorm2d(8),
            nn.Flatten(), nn.Linear(8, 4, bias=True)),
    }
    for tag, module in modules.items():
        wg = group_weight([], module, nn.BatchNorm2d, lr=0.1)
        assert len(wg) == 2 and wg[1]["weight_decay"] == 0.0
        assert wg[0]["lr"] == wg[1]["lr"] == 0.1
        decay_ids = {id(p) for p in wg[0]["params"]}
        no_decay_ids = {id(p) for p in wg[1]["params"]}
        params = {name: p.detach().numpy()
                  for name, p in module.named_parameters()}
        mask = group_weight_mask(params)
        for name, p in module.named_parameters():
            assert id(p) in (decay_ids if mask[name] else no_decay_ids), \
                (tag, name)


def test_label_tools_roundtrip(tmp_path):
    from dasemanticsegmentationaml_tpu.utils import label_tools as lt

    csv = tmp_path / "classes.csv"
    csv.write_text(
        "name,r,g,b,class_11\n"
        "sky,128,128,128,1\n"
        "road,128,64,128,1\n"
        "void,0,0,0,0\n"
    )
    info = lt.get_label_info(str(csv))
    assert info["sky"] == [128, 128, 128, 1]

    # color label -> class map -> color again
    label = np.zeros((4, 6, 3), np.uint8)
    label[0] = [128, 128, 128]   # sky = class 0
    label[1] = [128, 64, 128]    # road = class 1
    sem = lt.one_hot_it_v11(label, info)
    assert sem[0, 0] == 0 and sem[1, 0] == 1 and sem[3, 0] == 11

    dice = lt.one_hot_it_v11_dice(label, info)
    assert dice.shape == (4, 6, 3)  # 2 classes + void
    assert dice[0, 0, 0] == 1 and dice[1, 0, 1] == 1 and dice[3, 0, 2] == 1

    colored = lt.colour_code_segmentation(np.array([[0, 1]]), info)
    np.testing.assert_array_equal(colored[0, 0], [128, 128, 128])
    np.testing.assert_array_equal(colored[0, 1], [128, 64, 128])

    miou_dict, mean = lt.cal_miou([0.5, 0.7], str(csv))
    assert miou_dict == {"sky": 0.5, "road": 0.7}
    assert mean == pytest.approx(0.6)


def test_reverse_one_hot_and_accuracy():
    from dasemanticsegmentationaml_tpu.utils import label_tools as lt

    logits = np.zeros((3, 2, 2), np.float32)  # CHW like torch
    logits[2, 0, 0] = 1.0
    logits[1, 1, 1] = 1.0
    out = np.asarray(lt.reverse_one_hot(logits, class_axis=0))
    assert out[0, 0] == 2 and out[1, 1] == 1

    pred = np.array([0, 1, 2, 2])
    label = np.array([0, 1, 255, 2])
    # faithful: 255 counts as wrong
    assert lt.compute_global_accuracy(pred, label) == pytest.approx(0.75)


def test_random_crop_seeded_and_padded():
    from dasemanticsegmentationaml_tpu.utils.label_tools import RandomCrop

    img = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    c1 = RandomCrop((4, 6), seed=7)(img)
    c2 = RandomCrop((4, 6), seed=7)(img)
    assert c1.shape == (4, 6, 3)
    np.testing.assert_array_equal(c1, c2)  # deterministic given seed
    c3 = RandomCrop((4, 6), seed=8)(img)
    assert not np.array_equal(c1, c3)

    small = np.ones((2, 3), np.uint8)
    c4 = RandomCrop((4, 6), seed=0, pad_if_needed=True)(small)
    assert c4.shape == (4, 6)


def test_multihost_dcn_mesh_train_step():
    import jax
    import jax.numpy as jnp
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables, unused_param_mask)
    from dasemanticsegmentationaml_tpu.parallel import (
        create_mesh_multihost, batch_sharding, replicate_state,
        make_sharded_train_step)
    from dasemanticsegmentationaml_tpu.train import create_train_state
    from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

    mesh = create_mesh_multihost(dcn_size=2)  # fake 2 hosts x 4 chips
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4

    model = BiSeNet(n_classes=19)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, 32, 64, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9,
                         mask=unused_param_mask(variables["params"]))
    state = replicate_state(create_train_state(variables, opt), mesh)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.standard_normal((8, 32, 64, 3)).astype(np.float32),
        batch_sharding(mesh))
    labs = jax.device_put(rng.integers(0, 19, (8, 32, 64)).astype(np.int32),
                          batch_sharding(mesh))

    step = make_sharded_train_step(model, opt, mesh, sync_bn=True)
    new_state, loss = step(state, imgs, labs, 0.01)
    assert np.isfinite(float(loss))
