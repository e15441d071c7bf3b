"""Opt-in int8 post-training quantization (PTQ) for the inference path.

A TPU-native extension with no reference counterpart (the reference runs
fp16 AMP inference, train.py:83): v5e's MXU executes s8 x s8 -> s32 at
twice the bf16 rate and int8 halves HBM bytes, which attacks both
measured inference bottlenecks (CLAUDE.md: backbone ~42% MXU at bf16;
the post-128 batch cliff is HBM working-set pressure). Measured on the
chip with tools/probe_int8_conv.py: the 3x3 256->256 head conv runs
1.67x faster in int8, the narrow HBM-bound stage-8 1x1 1.31x.

Scheme (standard symmetric PTQ):

* weights: BN is folded into the conv (ops/norm.py::fold_bn_into_conv),
  then quantized per OUTPUT CHANNEL: ``w_int8 = round(w / w_scale)``,
  ``w_scale[c] = absmax(w[..., c]) / 127``.
* activations: per-tensor symmetric, scale calibrated as
  ``absmax / 127`` over calibration batches run in eval mode.
* conv: s8 x s8 -> s32 (``preferred_element_type=int32``), then a fused
  fp32 epilogue ``acc * (in_scale * w_scale[c]) + bias[c]`` + ReLU, cast
  back to the compute dtype.

Only conv+BN+ReLU blocks (``ConvX`` / ``ConvBNReLU``) quantize; depthwise
convs, attention gates, classifier 1x1s, pools and the BN-bearing
discriminators stay in bf16/fp32. Everything is opt-in via the models'
``quant_mode`` attribute ("off" | "calib" | "int8") -- parity paths are
untouched by default.

Workflow::

    calib  = collect_calibration(model, variables, batches)   # eval mode
    quant  = build_quant_collection(variables, calib)
    qmodel = model.clone(quant_mode="int8")
    logits = qmodel.apply({**variables, "quant": quant}, x, train=False)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import traverse_util

from .norm import fold_bn_into_conv

QUANT_COLLECTION = "quant"
CALIB_COLLECTION = "quant_calib"
_MODES = ("off", "calib", "int8")

_HIGHRES = {"features_0", "features_1", "features_2", "features_3"}
#: Named filter_fn presets for BiSeNet, measured on v5e at bs=128
#: (tools/bench_int8.py; bf16 reference 2659.7 img/s):
#:   head_ch  2796-2800 (+5.1%) -- the recommended default: the main-head
#:            3x3 256->256 plus cp.conv_head16/32, the only convs whose
#:            inputs AND outputs have a single live consumer on the eval
#:            path, so XLA fuses quantize into producers with no extra
#:            materialization
#:   head     2745-2761 (+3.2%)   heads_cp 2722.2   head_ffm 2680.8
#:   head_stem 2660.8 (stem int8 does NOT relieve the HBM-bound high-res
#:            stages)   all 2396.4   deep 2480.7   (concat/skip fan-outs
#:            materialize bf16+int8 copies in HBM-bound stages)
PRESET_FILTERS = {
    "all": None,
    "head": lambda p: p[0] == "conv_out",
    "heads_cp": lambda p: not (p[0] == "cp" and p[1] == "backbone"),
    "backbone": lambda p: p[0] == "cp" and p[1] == "backbone",
    "deep": lambda p: not (p[0] == "cp" and p[1] == "backbone"
                           and p[2] in _HIGHRES),
    # finer sweeps: conv_head16/32 are the only context-path convs whose
    # outputs have a single LIVE consumer on the eval path (their aux-head
    # consumers are dead-code-eliminated when only the main head is used)
    "head_ch": lambda p: p[0] == "conv_out" or (
        p[0] == "cp" and p[1] in ("conv_head16", "conv_head32")),
    "head_ffm": lambda p: p[0] in ("conv_out", "ffm"),
    # the stem ConvX pair (features_0/1) is the one single-consumer chain
    # in the HBM-bound high-res stages (no Cat-block concat fan-out);
    # int8 halves its activation bytes where the post-128 cliff lives
    "head_stem": lambda p: p[0] == "conv_out" or (
        p[0] == "cp" and p[1] == "backbone"
        and p[2] in ("features_0", "features_1")),
}


def check_quant_mode(mode: str) -> str:
    if mode not in _MODES:
        raise ValueError(f"quant_mode must be one of {_MODES}, got {mode!r}")
    return mode


def quantize_weights_per_channel(
        kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """HWIO fp kernel -> (int8 kernel, fp32 per-output-channel scale)."""
    kf = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activation(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    """fp tensor -> int8 with a per-tensor scale (inv_scale = 1/scale)."""
    xf = x.astype(jnp.float32) * inv_scale
    return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)


def int8_conv_epilogue(x: jax.Array, quant: Dict[str, jax.Array],
                       stride: int, padding: int, relu: bool = True,
                       dtype: Any = jnp.bfloat16) -> jax.Array:
    """Quantize ``x``, run the s8xs8->s32 conv, apply the fp32
    scale/bias(/ReLU) epilogue, and cast back to ``dtype``.

    ``quant`` holds: ``w_int8`` (HWIO), ``out_mul`` fp32 [Cout]
    (= in_scale * w_scale), ``bias`` fp32 [Cout] (BN folded),
    ``in_inv_scale`` fp32 scalar.
    """
    xq = quantize_activation(x, quant["in_inv_scale"])
    acc = jax.lax.conv_general_dilated(
        xq, quant["w_int8"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * quant["out_mul"] + quant["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def declare_quant_variables(module: nn.Module):
    """setup()-time declaration for 'calib' / 'int8' quant modes.

    flax only allows ``self.variable`` in setup/compact, so quant-capable
    modules call this from ``setup()`` and hand the result to
    record_input_absmax / quantized_conv_call in ``__call__``.
    """
    if module.quant_mode == "calib":
        return {name: module.variable(CALIB_COLLECTION, name,
                                      lambda: jnp.zeros((), jnp.float32))
                for name in ("in_absmax", "in_p999")}
    if module.quant_mode == "int8":
        # Selective quantization: a module the build step marked 'disabled'
        # (filter_fn excluded it) falls back to the fp path -- per-layer
        # mixed-precision deployment. A module with NO entry at all still
        # errors, so applying an int8 model without a quant collection
        # cannot silently run unquantized.
        if module.has_variable(QUANT_COLLECTION, "disabled"):
            return None

        def _missing(name):
            def init():
                raise ValueError(
                    f"quant collection has no '{name}'; run "
                    "collect_calibration + build_quant_collection first")
            return init

        return {name: module.variable(QUANT_COLLECTION, name,
                                      _missing(name))
                for name in ("w_int8", "out_mul", "bias", "in_inv_scale")}
    return None


def record_input_absmax(calib_vars, x: jax.Array) -> None:
    """'calib'-mode hook: track max|input| AND its 99.9th percentile in
    the quant_calib collection (both maxed over batches). The percentile
    supports outlier-robust scales (``clip='p999'``): one activation
    spike otherwise stretches the absmax scale until the bulk of the
    tensor quantizes to a handful of int8 levels.

    The quantile sorts a deterministic strided SUBSAMPLE capped at ~2^20
    elements: a full sort of a real eval tensor (1e8+ elements) would
    dominate calibration, and a 1M-point sample pins the 99.9th
    percentile far tighter than the batch-to-batch variation it feeds.
    """
    ax = jnp.abs(x.astype(jnp.float32)).ravel()
    calib_vars["in_absmax"].value = jnp.maximum(
        calib_vars["in_absmax"].value, jnp.max(ax))
    stride = max(1, ax.size // (1 << 20))
    # the raveled NHWC tensor is channel-periodic with period C: any
    # stride sharing a factor with C samples a channel SUBSET (stride
    # 192 on a C=3 stem input reads only the R channel; 256 on C=64
    # reads only channel 0), skewing the percentile toward whatever
    # that channel's distribution is. Make the stride coprime to C.
    channels = x.shape[-1] if x.ndim > 1 else 1
    while channels > 1 and math.gcd(stride, channels) != 1:
        stride += 1
    calib_vars["in_p999"].value = jnp.maximum(
        calib_vars["in_p999"].value, jnp.quantile(ax[::stride], 0.999))


def quantized_conv_call(quant_vars, x: jax.Array, *, stride: int,
                        padding: int, dtype: Any) -> jax.Array:
    """'int8'-mode body shared by ConvX / ConvBNReLU.

    Reads the offline-built quant collection entries declared by
    declare_quant_variables; BN is already folded into bias.
    """
    quant = {name: v.value for name, v in quant_vars.items()}
    return int8_conv_epilogue(x, quant, stride=stride, padding=padding,
                              relu=True, dtype=dtype)


def collect_calibration(model: nn.Module, variables: Dict[str, Any],
                        batches: Iterable[jax.Array],
                        method: Optional[Any] = None) -> Dict[str, Any]:
    """Run eval-mode forwards over ``batches`` and return the per-module
    input-absmax tree (the 'quant_calib' collection, maxed over batches)."""
    calib_model = model.clone(quant_mode="calib")

    @jax.jit
    def one(x):
        _, aux = calib_model.apply(variables, x, train=False,
                                   mutable=[CALIB_COLLECTION],
                                   method=method)
        return aux[CALIB_COLLECTION]

    absmax = None
    for x in batches:
        tree = one(x)
        absmax = tree if absmax is None else jax.tree.map(
            jnp.maximum, absmax, tree)
    if absmax is None:
        raise ValueError("collect_calibration needs at least one batch")
    return jax.device_get(absmax)


def build_quant_collection(variables: Dict[str, Any],
                           calib: Dict[str, Any],
                           eps: float = 1e-5,
                           filter_fn=None,
                           clip: str = "absmax") -> Dict[str, Any]:
    """Fold BN, quantize weights, and combine with calibrated activation
    scales into the 'quant' variable collection.

    Driven by the calibration tree: exactly the conv+BN blocks that ran in
    'calib' mode get entries (each records ``in_absmax`` at its own path,
    which by construction has ``conv``/``bn`` param children).

    ``filter_fn(path) -> bool``: optional per-layer selection; excluded
    paths get a 'disabled' marker and run the fp path at int8 apply time
    (mixed-precision deployment).

    ``clip``: 'absmax' (exact range) or 'p999' (99.9th-percentile scale;
    values beyond it saturate at +-127 -- robust to activation outliers).
    """
    if clip not in ("absmax", "p999"):
        raise ValueError(f"clip must be 'absmax' or 'p999', got {clip!r}")
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables.get("batch_stats", {}))
    flat_calib = traverse_util.flatten_dict(calib)
    out = {}
    for key, absmax in flat_calib.items():
        if key[-1] != "in_absmax":
            continue
        path = key[:-1]
        if clip == "p999":
            p999 = flat_calib[path + ("in_p999",)]
            # a >=99.9%-zero input (sparse post-ReLU map) calibrates
            # p999 to 0.0 -- the 1e-12 floor below would then saturate
            # ALL real signal to +-127; fall back to absmax there
            absmax = jnp.where(p999 > 0, p999, absmax)
        if filter_fn is not None and not filter_fn(path):
            out[path + ("disabled",)] = jnp.zeros((), jnp.int8)
            continue
        kernel = params[path + ("conv", "kernel")]
        folded_kernel, folded_bias = fold_bn_into_conv(
            kernel, None,
            params[path + ("bn", "scale")], params[path + ("bn", "bias")],
            stats[path + ("bn", "mean")], stats[path + ("bn", "var")],
            eps=eps)
        w_int8, w_scale = quantize_weights_per_channel(folded_kernel)
        in_scale = jnp.maximum(jnp.asarray(absmax, jnp.float32),
                               1e-12) / 127.0
        out[path + ("w_int8",)] = w_int8
        out[path + ("out_mul",)] = (in_scale * w_scale).astype(jnp.float32)
        out[path + ("bias",)] = folded_bias.astype(jnp.float32)
        out[path + ("in_inv_scale",)] = (1.0 / in_scale).astype(jnp.float32)
    if not out:
        raise ValueError("calibration tree contains no in_absmax records")
    return traverse_util.unflatten_dict(out)


def quantize_model(model: nn.Module, variables: Dict[str, Any],
                   batches: Iterable[jax.Array],
                   method: Optional[Any] = None,
                   filter_fn=None,
                   clip: str = "absmax",
                   ) -> Tuple[nn.Module, Dict[str, Any]]:
    """One-call PTQ: calibrate on ``batches`` (eval mode), build the quant
    collection, and return (int8 model, variables incl. 'quant')."""
    calib = collect_calibration(model, variables, batches, method=method)
    quant = build_quant_collection(variables, calib, filter_fn=filter_fn,
                                   clip=clip)
    return model.clone(quant_mode="int8"), {**variables,
                                            QUANT_COLLECTION: quant}
