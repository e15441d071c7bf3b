"""Checkpoint interop tests.

* roundtrips of our pure-Python .pth reader/writer against torch (oracle),
* loading the shipped reference artifact GTA5_model/GTA5_10_D1.pth,
* golden-logit parity: reference BiSeNet / discriminators (torch, CPU) vs our
  flax models with imported weights, eval mode, fixed inputs
  (SURVEY.md section 4 test plan).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference, requires_torch, REFERENCE_ROOT

from dasemanticsegmentationaml_tpu.utils.torch_io import (
    read_torch_checkpoint,
    write_torch_checkpoint,
    torch_key_to_flax,
    load_into_variables,
    load_pretrained,
    variables_to_torch_state,
    strip_module_prefix,
)
from dasemanticsegmentationaml_tpu.models import (
    BiSeNet,
    DepthWiseSepBNFCDiscriminator,
    FCDiscriminator,
)
from dasemanticsegmentationaml_tpu.models.bisenet import init_bisenet_variables

GTA5_D1 = os.path.join(REFERENCE_ROOT, "GTA5_model", "GTA5_10_D1.pth")


# ------------------------------------------------------------- reader/writer
@requires_torch
@pytest.mark.parametrize("zip_format", [True, False])
def test_read_torch_save_roundtrip(tmp_path, rng, zip_format):
    import torch

    state = {
        "a.weight": torch.tensor(rng.standard_normal((4, 3, 3, 3)).astype(np.float32)),
        "a.bias": torch.tensor(rng.standard_normal(4).astype(np.float32)),
        "bn.running_mean": torch.tensor(rng.standard_normal(4).astype(np.float32)),
        "bn.num_batches_tracked": torch.tensor(7, dtype=torch.int64),
        "fc.weight": torch.tensor(rng.standard_normal((2, 4)).astype(np.float32)),
    }
    p = str(tmp_path / "ck.pth")
    torch.save(state, p, _use_new_zipfile_serialization=zip_format)
    loaded = read_torch_checkpoint(p)
    assert set(loaded) == set(state)
    for k in state:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      state[k].numpy())


@requires_torch
def test_read_nested_dict_tar_style(tmp_path, rng):
    """Backbone .tar style: {'state_dict': {...}} (reference stdcnet.py:147)."""
    import torch

    inner = {"w": torch.tensor(rng.standard_normal((3, 3)).astype(np.float32))}
    p = str(tmp_path / "ck.tar")
    torch.save({"state_dict": inner, "epoch": 12}, p)
    obj = read_torch_checkpoint(p)
    assert "state_dict" in obj
    np.testing.assert_array_equal(np.asarray(obj["state_dict"]["w"]),
                                  inner["w"].numpy())


@requires_torch
def test_write_torch_checkpoint_loadable_by_torch(tmp_path, rng):
    import torch

    state = {
        "conv.weight": rng.standard_normal((8, 4, 3, 3)).astype(np.float32),
        "scalarish": rng.standard_normal((5,)).astype(np.float32),
        "ints": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    p = str(tmp_path / "out.pth")
    write_torch_checkpoint(p, state)
    loaded = torch.load(p, map_location="cpu", weights_only=True)
    assert set(loaded) == set(state)
    for k in state:
        np.testing.assert_array_equal(loaded[k].numpy(), state[k])


def test_write_read_own_roundtrip(tmp_path, rng):
    state = {"x.weight": rng.standard_normal((2, 3, 4, 5)).astype(np.float32)}
    p = str(tmp_path / "own.pth")
    write_torch_checkpoint(p, state)
    loaded = read_torch_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(loaded["x.weight"]),
                                  state["x.weight"])


# ------------------------------------------------------------------ mapping
def test_torch_key_to_flax_rules():
    assert torch_key_to_flax("module.cp.backbone.features.0.conv.weight", 4) \
        == ("params", ("cp", "backbone", "features_0", "conv", "kernel"), "conv")
    assert torch_key_to_flax("cp.backbone.features.2.conv_list.1.bn.weight", 1) \
        == ("params",
            ("cp", "backbone", "features_2", "conv_list_1", "bn", "scale"),
            None)
    assert torch_key_to_flax("bn1_d.running_var", 1) \
        == ("batch_stats", ("bn1_d", "var"), None)
    assert torch_key_to_flax("cp.backbone.fc.weight", 2) \
        == ("params", ("cp", "backbone", "fc", "kernel"), "linear")
    # DataParallel-prefixed duplicates of stage views are dropped
    assert torch_key_to_flax("cp.backbone.x2.0.0.conv.weight", 4) is None
    assert torch_key_to_flax("bn.num_batches_tracked", 0) is None
    assert strip_module_prefix("module.module.a.b") == "a.b"


# --------------------------------------------------------- shipped artifact
@requires_reference
def test_load_shipped_discriminator_checkpoint():
    state = read_torch_checkpoint(GTA5_D1)
    keys = set(state)
    assert "module.conv1_d.weight" in keys
    assert np.asarray(state["module.conv1_d.weight"]).shape == (19, 1, 4, 4)

    model = DepthWiseSepBNFCDiscriminator(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 19)))
    new_vars, report = load_into_variables(variables, state)
    assert not report["not_in_model"], report["not_in_model"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    # every param + running stat leaf must have been hit
    import flax

    n_leaves = len(flax.traverse_util.flatten_dict(variables["params"])) + \
        len(flax.traverse_util.flatten_dict(variables["batch_stats"]))
    assert len(report["loaded"]) == n_leaves
    out = model.apply(new_vars, jnp.ones((1, 64, 128, 19)) / 19.0)
    assert np.isfinite(np.asarray(out)).all()


@requires_reference
def test_shipped_discriminator_golden_logits():
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from model.discriminator import DepthWiseSepBNFCDiscriminator as TorchD

    rng = np.random.default_rng(0)
    x = rng.random((2, 19, 32, 64)).astype(np.float32)

    tmodel = TorchD(num_classes=19)
    state = {strip_module_prefix(k): torch.tensor(np.asarray(v))
             for k, v in read_torch_checkpoint(GTA5_D1).items()}
    tmodel.load_state_dict(state)
    tmodel.eval()
    with torch.no_grad():
        t_out = tmodel(torch.tensor(x)).numpy()

    jmodel = DepthWiseSepBNFCDiscriminator(num_classes=19)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 19)))
    new_vars, _ = load_into_variables(variables,
                                      read_torch_checkpoint(GTA5_D1))
    j_out = jmodel.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_out = np.asarray(j_out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ golden BiSeNet
@requires_reference
@pytest.mark.parametrize("use_conv_last", [False, True])
def test_bisenet_golden_logits_vs_reference(tmp_path, use_conv_last):
    """End-to-end golden parity: random-init reference BiSeNet (torch CPU),
    warm its BN running stats, export, import into our model, compare eval
    logits on a fixed input. use_conv_last=True adds the backbone's 1x1
    1024->1024 conv_last and moves ContextPath's conv_avg input
    (reference stdcnet.py:126,191-192, model_stages.py:101-106)."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from model.model_stages import BiSeNet as TorchBiSeNet

    torch.manual_seed(0)
    tmodel = TorchBiSeNet(backbone="STDCNet813", n_classes=19,
                          pretrain_model="", use_conv_last=use_conv_last)
    # Warm BN running stats so eval mode exercises real statistics.
    rng = np.random.default_rng(1)
    with torch.no_grad():
        tmodel.train()
        for _ in range(2):
            warm = torch.tensor(
                rng.standard_normal((2, 3, 64, 128)).astype(np.float32))
            tmodel(warm)
        tmodel.eval()

    x = rng.standard_normal((1, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        t_outs = [o.numpy() for o in tmodel(torch.tensor(x))]

    p = str(tmp_path / "bisenet.pth")
    torch.save(tmodel.state_dict(), p)

    jmodel = BiSeNet(n_classes=19, use_conv_last=use_conv_last)
    variables = init_bisenet_variables(jmodel, jax.random.PRNGKey(0),
                                       (1, 64, 128, 3))
    new_vars, report = load_pretrained(variables, p)
    assert not report["not_in_model"], report["not_in_model"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]

    j_outs = jmodel.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    for j, t in zip(j_outs, t_outs):
        j = np.asarray(j).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(j, t, rtol=1e-3, atol=1e-4)


@requires_reference
def test_bisenet_train_mode_golden_vs_reference(tmp_path):
    """Train-mode forward parity (batch-stat normalization path) -- the DA
    trainer runs all its forwards in train mode (reference train.py:203)."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from model.model_stages import BiSeNet as TorchBiSeNet

    torch.manual_seed(2)
    tmodel = TorchBiSeNet(backbone="STDCNet813", n_classes=19,
                          pretrain_model="", use_conv_last=False)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 64, 128)).astype(np.float32)
    # Snapshot BEFORE the forward: both frameworks then take exactly one
    # BN running-stat update from the same starting state.
    p = str(tmp_path / "bisenet_t.pth")
    torch.save(tmodel.state_dict(), p)
    tmodel.train()
    with torch.no_grad():
        t_outs = [o.numpy() for o in tmodel(torch.tensor(x))]

    jmodel = BiSeNet(n_classes=19)
    variables = init_bisenet_variables(jmodel, jax.random.PRNGKey(0),
                                       (1, 64, 128, 3))
    new_vars, _ = load_pretrained(variables, p)
    j_outs, mutated = jmodel.apply(
        new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
        mutable=["batch_stats"])
    for j, t in zip(j_outs, t_outs):
        j = np.asarray(j).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(j, t, rtol=1e-3, atol=1e-3)
    # running stats after one train step must match torch's update
    t_stats = tmodel.state_dict()
    ours = mutated["batch_stats"]["cp"]["backbone"]["features_0"]["bn"]
    np.testing.assert_allclose(
        np.asarray(ours["mean"]),
        t_stats["cp.backbone.features.0.bn.running_mean"].numpy(),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["var"]),
        t_stats["cp.backbone.features.0.bn.running_var"].numpy(),
        rtol=1e-3, atol=1e-4)


@requires_reference
def test_backbone_add_variant_golden_vs_reference(tmp_path):
    """Golden parity for the AddBottleneck backbone (reference
    stdcnet.py:121-123 selects it via type="add"; :17-64 is the block).
    The main paths always use "cat", so this is the only coverage the
    residual-add chain gets."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from model.stdcnet import STDCNet813 as TorchSTDC

    from dasemanticsegmentationaml_tpu.models import STDCNet813

    torch.manual_seed(4)
    tmodel = TorchSTDC(type="add", pretrain_model="")
    tmodel.eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        t_feats = [f.numpy() for f in tmodel(torch.tensor(x))]

    p = str(tmp_path / "stdc_add.pth")
    torch.save(tmodel.state_dict(), p)

    jmodel = STDCNet813(block_type="add")
    # init through the classifier path so the checkpoint's classifier-head
    # params (conv_last/fc/bn/linear) exist and load leaf-complete
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                            method=STDCNet813.classify)
    new_vars, report = load_pretrained(variables, p)
    assert not report["not_in_model"], report["not_in_model"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]

    j_feats = jmodel.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(j_feats) == len(t_feats) == 5
    for j, t in zip(j_feats, t_feats):
        j = np.asarray(j).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(j, t, rtol=1e-3, atol=1e-4)


@requires_reference
def test_backbone_classifier_golden_vs_reference(tmp_path):
    """Golden parity for the ImageNet classifier head (reference
    stdcnet.py:196-204 ``forward_impl``: conv_last -> pow(2) -> GAP -> fc
    -> relu -> dropout -> linear -- ``self.bn`` is defined at
    stdcnet.py:130 but never called), eval mode. The torch model's BN
    running stats are perturbed so that wrongly applying bn in classify()
    (a past parity bug) produces a visible divergence instead of hiding
    behind fresh-init near-identity stats."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from model.stdcnet import STDCNet813 as TorchSTDC

    from dasemanticsegmentationaml_tpu.models import STDCNet813

    torch.manual_seed(6)
    tmodel = TorchSTDC(pretrain_model="")
    with torch.no_grad():
        tmodel.bn.running_mean.uniform_(-2.0, 2.0)
        tmodel.bn.running_var.uniform_(0.1, 4.0)
    tmodel.eval()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel.forward_impl(torch.tensor(x)).numpy()

    p = str(tmp_path / "stdc_cls.pth")
    torch.save(tmodel.state_dict(), p)

    jmodel = STDCNet813()
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                            method=STDCNet813.classify)
    new_vars, report = load_pretrained(variables, p)
    assert not report["not_in_model"], report["not_in_model"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]

    j_out = jmodel.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         method=STDCNet813.classify)
    assert j_out.shape == (2, 1000)
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------------- export
@requires_torch
def test_export_variables_as_torch_state(tmp_path):
    """Our FCDiscriminator variables -> torch state dict -> reference model
    load -> same logits (export parity)."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from model.discriminator import FCDiscriminator as TorchFCD
    except ImportError:
        pytest.skip("reference unavailable")

    jmodel = FCDiscriminator(num_classes=19)
    variables = jmodel.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 64, 19)))
    state = variables_to_torch_state(variables)
    p = str(tmp_path / "export.pth")
    write_torch_checkpoint(p, state)

    tmodel = TorchFCD(num_classes=19)
    tmodel.load_state_dict(torch.load(p, weights_only=True))
    tmodel.eval()

    rng = np.random.default_rng(5)
    x = rng.random((1, 19, 32, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(x)).numpy()
    j_out = np.asarray(
        jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-5)


def test_corrupt_zip_checkpoint_fails_loudly(tmp_path, rng):
    """A checkpoint whose storage payload disagrees with its metadata
    must raise, not load garbage weights: numpy's as_strided performs no
    bounds checks, so without the torch_io validation an out-of-bounds
    read would silently fill parameters with adjacent memory."""
    import zipfile

    state = {"w": rng.standard_normal((4, 4)).astype(np.float32)}
    p = str(tmp_path / "c.pth")
    write_torch_checkpoint(p, state)
    # truncate the storage member's bytes, keep everything else
    trunc = str(tmp_path / "trunc.pth")
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(trunc, "w") as zout:
        for n in zin.namelist():
            data = zin.read(n)
            if n.split("/")[-2:-1] == ["data"]:
                data = data[:-8]
            zout.writestr(n, data)
    with pytest.raises(ValueError, match="corrupt checkpoint"):
        read_torch_checkpoint(trunc)


def test_non_checkpoint_zip_fails_with_named_error(tmp_path):
    """Any zip without a data.pkl member (e.g. an export bundle fed to
    --pretrain_path by mistake) must raise the module's ValueError, not
    escape as a bare StopIteration; and 'metadata.pkl' must not be
    mistaken for the checkpoint pickle."""
    import zipfile

    p = str(tmp_path / "bundle.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("programs/metadata.pkl", b"not a checkpoint")
    with pytest.raises(ValueError, match="no data.pkl"):
        read_torch_checkpoint(p)


def test_load_pretrain_dispatch_and_zero_match_guard(tmp_path, rng):
    """Reference dispatch on the FULL path (stdcnet.py:141: 'STDCNet' in
    pretrain_path — a basename-only match silently skipped
    .../STDCNet813/model.tar), and ZERO matched tensors must raise
    instead of silently training from random init."""
    import pytest as _pytest

    from dasemanticsegmentationaml_tpu import cli
    from dasemanticsegmentationaml_tpu.models import build_discriminator

    d = build_discriminator(19, depthwise=True, batch_norm=True)
    variables = d.init(jax.random.PRNGKey(0), np.zeros((1, 32, 64, 19),
                                                       np.float32))
    # neither rule matches: unchanged variables, no exception
    out = cli.load_pretrain(variables, str(tmp_path / "weights.bin"))
    assert out is variables
    # a .pth whose keys match nothing must raise, not silently no-op
    bad = str(tmp_path / "junk.pth")
    write_torch_checkpoint(bad, {"totally.unrelated.weight":
                                 rng.standard_normal((3, 3))
                                 .astype(np.float32)})
    with _pytest.raises(SystemExit, match="ZERO tensors"):
        cli.load_pretrain(variables, bad)
