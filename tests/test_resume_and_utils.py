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
