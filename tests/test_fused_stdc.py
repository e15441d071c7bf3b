"""Fused CatBottleneck kernel correctness (interpret mode on CPU).

The kernels are experimental (see ops/pallas/fused_stdc.py STATUS);
correctness is still pinned down so they stay healthy for when the
pallas DMA pipeline catches up to HBM speed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dasemanticsegmentationaml_tpu.models.stdcnet import CatBottleneck
from dasemanticsegmentationaml_tpu.ops.pallas import fused_stdc as fs


@pytest.mark.parametrize("stride,in_c,out_c,h,w", [
    (1, 64, 64, 16, 16),
    (2, 32, 64, 32, 32),
])
def test_fused_cat_matches_flax(stride, in_c, out_c, h, w):
    rng = np.random.default_rng(0)
    m = CatBottleneck(out_planes=out_c, block_num=4, stride=stride,
                      dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, h, w, in_c)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x, train=False))
    fp = fs.fold_cat_params(v["params"], v["batch_stats"], stride,
                            jnp.float32)
    got = np.asarray(fs.fused_cat_bottleneck(x, fp, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_space_to_depth_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    s = np.asarray(fs.space_to_depth2(jnp.asarray(x)))
    assert s.shape == (2, 4, 6, 20)
    # lane group 2a+b == pixel (2t+a, 2p+b)
    for a in range(2):
        for b in range(2):
            g = s[..., (2 * a + b) * 5:(2 * a + b + 1) * 5]
            np.testing.assert_array_equal(g, x[:, a::2, b::2, :])


def test_fold_cat_param_shapes():
    m = CatBottleneck(out_planes=256, block_num=4, stride=2,
                      dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 64), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    fp = fs.fold_cat_params(v["params"], v["batch_stats"], 2)
    assert fp.w1.shape == (64, 128)
    assert fp.k2.shape == (3, 3, 128, 64)
    assert fp.k3.shape == (3, 3, 64, 32)
    assert fp.k4.shape == (3, 3, 32, 32)
    assert fp.avd_k.shape == (3, 3, 128)
