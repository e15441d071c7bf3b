"""Opt-in int8 PTQ inference path (ops/quantize.py).

A TPU-native extension (no reference counterpart): conv+BN+ReLU blocks
run s8xs8->s32 on the MXU with BN folded and calibrated per-tensor
activation scales. These tests pin the workflow (calibrate -> build ->
int8 apply), its accuracy vs the fp path, and that the default
quant_mode="off" leaves parity surfaces untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables,
)
from dasemanticsegmentationaml_tpu.models.stdcnet import ConvX
from dasemanticsegmentationaml_tpu.ops.quantize import (
    build_quant_collection,
    collect_calibration,
    quantize_model,
    quantize_weights_per_channel,
)


def test_weight_quantizer_per_channel():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) *
                    rng.uniform(0.1, 10.0, (16,)), jnp.float32)
    q, scale = quantize_weights_per_channel(k)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    # round-to-nearest: reconstruction error bounded by scale/2 per channel
    err = jnp.max(jnp.abs(q.astype(jnp.float32) * scale - k), axis=(0, 1, 2))
    assert bool(jnp.all(err <= scale * 0.5 + 1e-7))


@pytest.fixture(scope="module")
def convx_setup():
    m = ConvX(16, kernel=3, stride=2, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v, x


def test_convx_int8_matches_fp32(convx_setup):
    m, v, x = convx_setup
    ref = m.apply(v, x, train=False)
    qm, qv = quantize_model(m, v, [x])
    out = qm.apply(qv, x, train=False)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05  # 8-bit weights x 8-bit activations
    assert set(traverse_util.flatten_dict(qv["quant"])) == {
        ("w_int8",), ("out_mul",), ("bias",), ("in_inv_scale",)}


def test_int8_mode_is_inference_only(convx_setup):
    m, v, x = convx_setup
    qm, qv = quantize_model(m, v, [x])
    with pytest.raises(ValueError, match="inference-only"):
        qm.apply(qv, x, train=True)


def test_int8_without_quant_collection_raises(convx_setup):
    m, v, x = convx_setup
    qm = m.clone(quant_mode="int8")
    with pytest.raises(Exception, match="quant"):
        qm.apply(v, x, train=False)


def test_calibration_takes_max_over_batches(convx_setup):
    m, v, x = convx_setup
    small, big = x * 0.1, x * 3.0
    calib_b = collect_calibration(m, v, [small, big])
    calib_s = collect_calibration(m, v, [small])
    flat_b = traverse_util.flatten_dict(calib_b)
    flat_s = traverse_util.flatten_dict(calib_s)
    assert flat_b[("in_absmax",)] == pytest.approx(
        float(jnp.max(jnp.abs(big))))
    assert flat_s[("in_absmax",)] < flat_b[("in_absmax",)]
    quant = build_quant_collection(v, calib_b)
    inv = traverse_util.flatten_dict(quant)[("in_inv_scale",)]
    assert inv == pytest.approx(127.0 / float(jnp.max(jnp.abs(big))),
                                rel=1e-5)


def test_bisenet_int8_end_to_end():
    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    rng = np.random.default_rng(2)
    batches = [jnp.asarray(rng.standard_normal((2, 64, 128, 3)),
                           jnp.float32) for _ in range(2)]
    ref = model.apply(v, batches[0], train=False)[0]
    qmodel, qv = quantize_model(model, v, batches)
    out = qmodel.apply(qv, batches[0], train=False)[0]

    cos = float(jnp.sum(ref * out) /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(out)))
    agree = float(jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(out, -1)))
    assert cos > 0.995
    assert agree > 0.97  # random-init weights are PTQ's worst case

    # exactly the conv+BN+ReLU blocks quantize; gates/classifiers/dw stay fp
    paths = {p[:-1] for p in traverse_util.flatten_dict(qv["quant"])}
    assert len(paths) == 35
    names = {p[-1] for p in paths}
    assert "conv_atten" not in names and "conv_out" not in names
    flat = traverse_util.flatten_dict(qv["quant"])
    assert all(flat[p + ("w_int8",)].dtype == jnp.int8 for p in paths)

    # the params tree is untouched (checkpoint interop unaffected)
    assert jax.tree_util.tree_structure(qv["params"]) == \
        jax.tree_util.tree_structure(v["params"])


def test_selective_quantization_filter():
    """filter_fn: excluded layers get a 'disabled' marker and run the fp
    path, so mixed-precision deployments pick exactly the layers that win
    on the target hardware (tools/bench_int8.py variants)."""
    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, 32, 64, 3))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)
    ref = model.apply(v, x, train=False)[0]

    # quantize ONLY the main head's 3x3 conv
    qmodel, qv = quantize_model(model, v, [x],
                                filter_fn=lambda p: p[0] == "conv_out")
    flat = traverse_util.flatten_dict(qv["quant"])
    quantized = {p[:-1] for p in flat if p[-1] == "w_int8"}
    disabled = {p[:-1] for p in flat if p[-1] == "disabled"}
    assert quantized == {("conv_out", "conv")}
    assert len(disabled) == 34 and not (quantized & disabled)

    out = qmodel.apply(qv, x, train=False)[0]
    assert not jnp.allclose(out, ref)  # the head really runs int8
    # everything else is fp: far tighter than the all-quantized model
    cos = float(jnp.sum(ref * out) /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(out)))
    assert cos > 0.9995


def test_percentile_clip_is_outlier_robust(convx_setup):
    """clip='p999': one activation spike must not stretch the scale. With
    absmax calibration a 1000x outlier leaves the bulk of the tensor on a
    handful of int8 levels; the percentile scale saturates the spike and
    keeps the bulk accurate."""
    m, v, x = convx_setup
    spiked = x.at[0, 0, 0, 0].set(1000.0)  # calibration saw one outlier
    ref = m.apply(v, x, train=False)  # quality measured on clean inputs

    def err_of(clip):
        qm, qv = quantize_model(m, v, [spiked], clip=clip)
        out = qm.apply(qv, x, train=False)
        return float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))

    err_absmax, err_p999 = err_of("absmax"), err_of("p999")
    assert err_p999 < 0.05
    assert err_absmax > 0.5  # the spike-stretched scale wrecked the bulk

    # the calibration tree records both statistics, percentile << absmax
    calib = collect_calibration(m, v, [spiked])
    flat = traverse_util.flatten_dict(calib)
    assert flat[("in_absmax",)] == pytest.approx(1000.0)
    assert flat[("in_p999",)] < 50.0

    with pytest.raises(ValueError, match="clip"):
        quantize_model(m, v, [spiked], clip="p90")


def test_percentile_clip_sparse_input_falls_back(convx_setup):
    """>=99.9%-zero calibration input (sparse post-ReLU map): in_p999
    calibrates to 0, which must fall back to the absmax scale instead of
    saturating all real signal through the 1e-12 floor."""
    m, v, x = convx_setup
    sparse = jnp.zeros_like(x).at[0, :2, :2, 0].set(5.0)
    ref = m.apply(v, sparse, train=False)
    qm, qv = quantize_model(m, v, [sparse], clip="p999")
    flat = traverse_util.flatten_dict(qv["quant"])
    assert float(flat[("in_inv_scale",)]) == pytest.approx(127.0 / 5.0,
                                                           rel=1e-5)
    out = qm.apply(qv, sparse, train=False)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert err < 0.1


def test_preset_filters_partition_bisenet():
    """PRESET_FILTERS (the --quantize_filter choices) resolve against the
    real BiSeNet tree: 'head' picks exactly the main-head 3x3,
    'backbone'/'heads_cp' partition all 35 blocks, 'deep' excludes the
    high-res backbone stages."""
    from dasemanticsegmentationaml_tpu.ops.quantize import PRESET_FILTERS

    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, 32, 64, 3))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)

    def quantized_paths(filter_fn):
        _, qv = quantize_model(model, v, [x], filter_fn=filter_fn)
        flat = traverse_util.flatten_dict(qv["quant"])
        return {p[:-1] for p in flat if p[-1] == "w_int8"}

    sel = {name: quantized_paths(fn) for name, fn in PRESET_FILTERS.items()}
    assert len(sel["all"]) == 35
    assert sel["head"] == {("conv_out", "conv")}
    # backbone + heads_cp partition the full set
    assert sel["backbone"] | sel["heads_cp"] == sel["all"]
    assert not sel["backbone"] & sel["heads_cp"]
    # deep = all minus the four high-res backbone stages, and covers head
    assert sel["head"] < sel["deep"] < sel["all"]
    assert all(p[2] not in {"features_0", "features_1", "features_2",
                            "features_3"}
               for p in sel["deep"] if p[:2] == ("cp", "backbone"))
    # finer sweep presets: each = head plus one specific region
    assert sel["head_ch"] - sel["head"] == {
        ("cp", "conv_head16"), ("cp", "conv_head32")}
    assert sel["head"] < sel["head_ffm"]
    assert all(p[0] == "ffm" for p in sel["head_ffm"] - sel["head"])
    assert {p[:3] for p in sel["head_stem"] - sel["head"]} == {
        ("cp", "backbone", "features_0"),
        ("cp", "backbone", "features_1")}


def test_cli_accepts_every_preset_name():
    """--quantize_filter choices derive from PRESET_FILTERS (config.py),
    so adding a preset automatically makes it CLI-selectable."""
    from dasemanticsegmentationaml_tpu.ops.quantize import PRESET_FILTERS
    from dasemanticsegmentationaml_tpu.utils.config import parse_args

    for name in PRESET_FILTERS:
        assert parse_args(["--quantize_filter", name]).quantize_filter \
            == name
    assert parse_args([]).quantize_filter == "head_ch"  # measured-best
    with pytest.raises(SystemExit):
        parse_args(["--quantize_filter", "nope"])


def test_quant_mode_off_is_default_and_param_neutral():
    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    assert model.quant_mode == "off"
    v = init_bisenet_variables(model, jax.random.PRNGKey(0), (1, 32, 64, 3))
    assert set(v.keys()) == {"params", "batch_stats"}  # no quant collections
