"""Model structure tests: param counts and output shapes vs measured facts.

Expected numbers come from instantiating the reference implementation
(SURVEY.md section 2.1 measured-facts block):
  BiSeNet 11,550,496 params (backbone 8,443,552);
  FCDiscriminator 2,781,121 -> (1,1,H/32,W/32);
  DW 190,340 and DW+BN 193,194 -> (1,1,H/32+1,W/32+1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dasemanticsegmentationaml_tpu.models import (
    BiSeNet,
    STDCNet813,
    FCDiscriminator,
    DepthWiseSepFCDiscriminator,
    DepthWiseSepBNFCDiscriminator,
    build_discriminator,
)
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables,
    unused_param_mask,
)


def count(tree):
    return sum(int(x.size) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def bisenet_vars():
    model = BiSeNet(n_classes=19)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, 64, 128, 3))
    return model, variables


def test_bisenet_param_count(bisenet_vars):
    model, variables = bisenet_vars
    assert count(variables["params"]) == 11_550_496
    assert count(variables["params"]["cp"]["backbone"]) == 8_443_552


def test_backbone_stage_param_counts():
    """Per-stage counts from the survey (ConvX 928, ConvX 18,560, Cat
    111,488 / 134,656 / 474,880 / 537,600 / 1,891,840 / 2,148,352)."""
    model = STDCNet813()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    expected = [928, 18_560, 111_488, 134_656, 474_880, 537_600,
                1_891_840, 2_148_352]
    params = variables["params"]
    stats = variables["batch_stats"]
    for i, exp in enumerate(expected):
        name = f"features_{i}"
        # params exclude BN running stats (torch buffers)
        assert count(params[name]) == exp, name


def test_backbone_feature_shapes():
    model = STDCNet813()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    feats = model.apply(variables, jnp.zeros((2, 64, 128, 3)))
    shapes = [f.shape for f in feats]
    assert shapes == [
        (2, 32, 64, 32),
        (2, 16, 32, 64),
        (2, 8, 16, 256),
        (2, 4, 8, 512),
        (2, 2, 4, 1024),
    ]


def test_bisenet_output_shapes(bisenet_vars):
    model, variables = bisenet_vars
    x = jnp.zeros((2, 64, 128, 3))
    out, out16, out32 = model.apply(variables, x, train=False)
    for o in (out, out16, out32):
        assert o.shape == (2, 64, 128, 19)


def test_bisenet_train_mode_mutates_batch_stats(bisenet_vars):
    model, variables = bisenet_vars
    x = jnp.ones((1, 64, 128, 3))
    outs, updated = model.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed


def test_discriminator_param_counts_and_shapes():
    x = jnp.zeros((1, 64, 128, 19))
    expectations = [
        (FCDiscriminator, 2_781_121, (1, 2, 4, 1)),
        (DepthWiseSepFCDiscriminator, 190_340, (1, 3, 5, 1)),
        (DepthWiseSepBNFCDiscriminator, 193_194, (1, 3, 5, 1)),
    ]
    for cls, n_params, out_shape in expectations:
        model = cls(num_classes=19)
        variables = model.init(jax.random.PRNGKey(0), x)
        assert count(variables["params"]) == n_params, cls.__name__
        out = model.apply(variables, x)
        # DW variants: +1 from padding=1 on the 1x1 pointwise convs
        # (reference discriminator.py:36,39,42,45; SURVEY.md 2.1).
        assert out.shape == out_shape, cls.__name__


def test_build_discriminator_selection():
    assert isinstance(build_discriminator(19), FCDiscriminator)
    assert isinstance(build_discriminator(19, depthwise=True),
                      DepthWiseSepFCDiscriminator)
    assert isinstance(build_discriminator(19, depthwise=True, batch_norm=True),
                      DepthWiseSepBNFCDiscriminator)


def test_unused_param_mask(bisenet_vars):
    model, variables = bisenet_vars
    mask = unused_param_mask(variables["params"])
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    dead = [p for p, m in flat.items() if not m]
    # Exactly the classifier-head subtrees are masked.
    assert all(p[:2] == ("cp", "backbone") for p in dead)
    dead_roots = {p[2] for p in dead}
    assert dead_roots == {"fc", "bn", "linear", "conv_last"}
    # Masked size equals the measured classifier head size.
    flatp = flax.traverse_util.flatten_dict(variables["params"])
    masked_n = sum(int(flatp[p].size) for p in dead)
    assert masked_n == 3_125_248


def test_bisenet_bf16_forward(bisenet_vars):
    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, 64, 128, 3))
    out, _, _ = model.apply(variables, jnp.ones((1, 64, 128, 3)), train=False)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_stdcnet_nondefault_layers_stage_strides():
    """`layers` is configurable (reference STDC2/1446 uses [4,5,3] with
    the same machinery): stage slices must be DERIVED from it — the
    hardcoded (2,4),(4,6),(6,n) boundaries of layers=(2,2,2) silently
    mis-assign blocks to strides for any other value."""
    import jax

    model = STDCNet813(layers=(4, 5, 3))
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x, train=False)
    assert len(feats) == 5
    for i, f in enumerate(feats):
        stride = 2 ** (i + 1)
        assert f.shape[1:3] == (64 // stride, 128 // stride), (i, f.shape)
    # channel plan still doubles per stage after the stem (64-256-512-1024)
    assert [f.shape[-1] for f in feats] == [32, 64, 256, 512, 1024]
