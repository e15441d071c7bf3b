"""BiSeNet context path + segmentation heads, TPU-native.

Capability-parity re-design of reference model/model_stages.py:

* ``ConvBNReLU``               (reference model_stages.py:11-35)
* ``BiSeNetOutput``            (reference model_stages.py:38-65)
* ``AttentionRefinementModule``(reference model_stages.py:68-91)
* ``ContextPath``              (reference model_stages.py:94-152) -- note the
  reference hardcodes STDCNet813 regardless of the ``backbone`` arg
  (model_stages.py:98); we honor the arg but default to stdc813.
* ``FeatureFusionModule``      (reference model_stages.py:155-202)
* ``BiSeNet``                  (reference model_stages.py:205-270): three
  19-class heads, all bilinearly upsampled to the input size with
  align_corners=True (model_stages.py:240-242).

NHWC, fp32 params, configurable compute dtype. Global pooling is a mean over
the spatial axes; nearest upsamples use torch ``mode='nearest'`` rules
(ops/resize.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNorm
from ..ops.quantize import (check_quant_mode, declare_quant_variables,
                            quantized_conv_call, record_input_absmax)
from ..ops.resize import resize_bilinear_align_corners, upsample_nearest
from .stdcnet import STDCNet813, conv_precision


class ConvBNReLU(nn.Module):
    """conv(ks, stride, pad) no-bias + BN + ReLU (model_stages.py:11-29)."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        check_quant_mode(self.quant_mode)
        p = self.padding
        self.conv = nn.Conv(
            features=self.out_chan,
            kernel_size=(self.ks, self.ks),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )
        self.bn = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name)
        self.quant_vars = declare_quant_variables(self)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant_mode == "int8":
            if train:
                raise ValueError("int8 quant_mode is inference-only")
            if self.quant_vars is not None:  # None = filtered out -> fp
                return quantized_conv_call(self.quant_vars, x,
                                           stride=self.stride,
                                           padding=self.padding,
                                           dtype=self.dtype)
        if self.quant_mode == "calib" and not train:
            record_input_absmax(self.quant_vars, x)
        return nn.relu(self.bn(self.conv(x), use_running_average=not train))


class BiSeNetOutput(nn.Module):
    """3x3 ConvBNReLU + 1x1 no-bias classifier conv (model_stages.py:38-48)."""

    mid_chan: int
    n_classes: int
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        self.conv = ConvBNReLU(self.mid_chan, ks=3, stride=1, padding=1,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               quant_mode=self.quant_mode)
        self.conv_out = nn.Conv(
            features=self.n_classes, kernel_size=(1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.conv_out(self.conv(x, train))


class AttentionRefinementModule(nn.Module):
    """Channel attention: conv3x3 -> global pool -> 1x1 conv -> BN -> sigmoid
    gate (model_stages.py:68-85)."""

    out_chan: int
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        self.conv = ConvBNReLU(self.out_chan, ks=3, stride=1, padding=1,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               quant_mode=self.quant_mode)
        self.conv_atten = nn.Conv(
            features=self.out_chan, kernel_size=(1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )
        self.bn_atten = BatchNorm(dtype=self.dtype,
                                  axis_name=self.bn_axis_name)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feat = self.conv(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = self.conv_atten(atten)
        atten = self.bn_atten(atten, use_running_average=not train)
        atten = nn.sigmoid(atten)
        return feat * atten


class ContextPath(nn.Module):
    """Backbone + ARM pyramid + global context (model_stages.py:94-135)."""

    backbone_name: str = "STDCNet813"
    use_conv_last: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        # Reference ignores the backbone arg (model_stages.py:98). We accept
        # only the supported family but keep the arg for CLI compatibility.
        if self.backbone_name not in ("STDCNet813", "CatmodelSmall",
                                      "CatNetSmall", "STDC1"):
            raise ValueError(f"unsupported backbone {self.backbone_name}")
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        self.backbone = STDCNet813(use_conv_last=self.use_conv_last, **kw)
        inplanes = 1024
        self.arm16 = AttentionRefinementModule(128, **kw)
        self.arm32 = AttentionRefinementModule(128, **kw)
        self.conv_head32 = ConvBNReLU(128, ks=3, stride=1, padding=1, **kw)
        self.conv_head16 = ConvBNReLU(128, ks=3, stride=1, padding=1, **kw)
        self.conv_avg = ConvBNReLU(128, ks=1, stride=1, padding=0, **kw)

    def __call__(self, x: jax.Array, train: bool = False):
        feat2, feat4, feat8, feat16, feat32 = self.backbone(x, train)
        h8, w8 = feat8.shape[1:3]
        h16, w16 = feat16.shape[1:3]
        h32, w32 = feat32.shape[1:3]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = self.conv_avg(avg, train)
        avg_up = upsample_nearest(avg, (h32, w32))

        feat32_arm = self.arm32(feat32, train)
        feat32_sum = feat32_arm + avg_up
        feat32_up = upsample_nearest(feat32_sum, (h16, w16))
        feat32_up = self.conv_head32(feat32_up, train)

        feat16_arm = self.arm16(feat16, train)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = upsample_nearest(feat16_sum, (h8, w8))
        feat16_up = self.conv_head16(feat16_up, train)

        return feat2, feat4, feat8, feat16, feat16_up, feat32_up


class FeatureFusionModule(nn.Module):
    """Concat spatial+context, 1x1 ConvBNReLU, SE-style gate + residual
    (model_stages.py:155-185)."""

    out_chan: int
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        self.convblk = ConvBNReLU(self.out_chan, ks=1, stride=1, padding=0,
                                  dtype=self.dtype,
                                  bn_axis_name=self.bn_axis_name,
                                  quant_mode=self.quant_mode)
        self.conv1 = nn.Conv(features=self.out_chan // 4, kernel_size=(1, 1),
                             use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             precision=conv_precision(self.dtype))
        self.conv2 = nn.Conv(features=self.out_chan, kernel_size=(1, 1),
                             use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             precision=conv_precision(self.dtype))

    def __call__(self, fsp: jax.Array, fcp: jax.Array,
                 train: bool = False) -> jax.Array:
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = self.convblk(fcat, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = self.conv1(atten)
        atten = nn.relu(atten)
        atten = self.conv2(atten)
        atten = nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNet(nn.Module):
    """Full segmentation network (model_stages.py:205-244).

    ``__call__`` returns the three upsampled head outputs as NHWC logits
    (out, out16, out32), matching reference ordering. ``features`` returns
    the pre-upsample head outputs for fused eval/discriminator-on-out32
    pipelines (the train_nni.py variant feeds out32 to D --
    reference train_nni.py:135,150,156).
    """

    n_classes: int
    backbone_name: str = "STDCNet813"
    use_conv_last: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        self.cp = ContextPath(backbone_name=self.backbone_name,
                              use_conv_last=self.use_conv_last, **kw)
        self.ffm = FeatureFusionModule(256, **kw)
        self.conv_out = BiSeNetOutput(256, self.n_classes, **kw)
        self.conv_out16 = BiSeNetOutput(64, self.n_classes, **kw)
        self.conv_out32 = BiSeNetOutput(64, self.n_classes, **kw)

    def features(self, x: jax.Array, train: bool = False):
        """Head logits at their native strides (1/8, 1/8, 1/16)."""
        x = x.astype(self.dtype)
        (feat_res2, feat_res4, feat_res8, feat_res16,
         feat_cp8, feat_cp16) = self.cp(x, train)
        feat_fuse = self.ffm(feat_res8, feat_cp8, train)
        feat_out = self.conv_out(feat_fuse, train)
        feat_out16 = self.conv_out16(feat_cp8, train)
        feat_out32 = self.conv_out32(feat_cp16, train)
        return feat_out, feat_out16, feat_out32

    def __call__(self, x: jax.Array, train: bool = False):
        h, w = x.shape[1:3]
        feat_out, feat_out16, feat_out32 = self.features(x, train)
        feat_out = resize_bilinear_align_corners(feat_out, (h, w))
        feat_out16 = resize_bilinear_align_corners(feat_out16, (h, w))
        feat_out32 = resize_bilinear_align_corners(feat_out32, (h, w))
        return feat_out, feat_out16, feat_out32

    def full_init(self, x: jax.Array):
        """Init-time tracer that also touches the backbone's ImageNet
        classifier head, so the parameter tree structurally matches the
        reference's state_dict (which always contains conv_last/fc/bn/linear,
        reference stdcnet.py:126-132). Use as
        ``model.init(rng, x, method=BiSeNet.full_init)``."""
        outs = self(x, train=False)
        _ = self.cp.backbone.classify(x, train=False)
        return outs


def init_bisenet_variables(model: "BiSeNet", rng, input_shape):
    """Initialize a BiSeNet with the complete (checkpoint-parity) param set."""
    x = jnp.zeros(input_shape, jnp.float32)
    return model.init(rng, x, method=BiSeNet.full_init)


def unused_param_mask(params, use_conv_last: bool = False):
    """True = trainable. Masks the backbone classifier-head params that never
    receive gradients in segmentation mode, so weight decay cannot silently
    shrink them (torch skips params with ``grad is None`` -- parity).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    head_prefix = ("cp", "backbone")
    dead = {"fc", "bn", "linear", "drop"}
    if not use_conv_last:
        dead = dead | {"conv_last"}
    mask = {}
    for path in flat:
        is_dead = (
            len(path) > 2
            and path[:2] == head_prefix
            and path[2] in dead
        )
        mask[path] = not is_dead
    return flax.traverse_util.unflatten_dict(mask)
