"""STDC backbone (STDC1 / "813" configuration), TPU-native.

Re-designed from the behavior of reference model/stdcnet.py:

* ``ConvX``          -- conv(k, s, pad=k//2, no bias) + BN + ReLU
                        (reference stdcnet.py:6-15)
* ``CatBottleneck``  -- 1x1 entry conv then a chain of channel-halving 3x3
                        convs whose outputs are concatenated; the stride-2
                        variant downsamples branch 1 with a depthwise
                        "avd" conv and the entry branch with a 3x3 avg-pool
                        (reference stdcnet.py:66-113)
* ``AddBottleneck``  -- same chain but summed with a (possibly strided)
                        skip projection (reference stdcnet.py:17-64)
* ``STDCNet813``     -- stem of two stride-2 ConvX + 6 bottlenecks, exposing
                        feature maps at strides 2/4/8/16/32 with channels
                        32/64/256/512/1024 (reference stdcnet.py:116-204),
                        plus the ImageNet classifier head (conv_last / fc /
                        bn / linear, reference stdcnet.py:126-132,196-204)
                        so ``.tar`` pretrain checkpoints import 1:1.

TPU-first choices: NHWC layout, channels on the 128-lane axis; compute dtype
is configurable (bf16 for MXU-friendly convs) with fp32 params; BN is the
torch-faithful implementation in ops/norm.py. Module/attribute names mirror
the reference state_dict keys so checkpoint import is a mechanical rename
(see utils/torch_io.py).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNorm
from ..ops.quantize import (check_quant_mode, declare_quant_variables,
                            quantized_conv_call, record_input_absmax)


def conv_precision(dtype) -> Any:
    """fp32 compute -> 'highest' (parity-exact convs: XLA's default truncates
    fp32 convs to bf16 passes); bf16 compute -> backend default (native MXU
    bf16 x bf16 -> fp32 accumulation)."""
    return "highest" if dtype == jnp.float32 else None


def _conv(features: int, kernel: int, stride: int = 1, groups: int = 1,
          use_bias: bool = False, dtype: Any = jnp.float32) -> nn.Conv:
    pad = kernel // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=conv_precision(dtype),
    )


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """3x3 avg pool, stride 2, pad 1, count_include_pad=True (torch default).

    Matches ``nn.AvgPool2d(kernel_size=3, stride=2, padding=1)`` used as the
    CatBottleneck skip (reference stdcnet.py:78): zero-pad then divide by 9.

    bf16 path: a ones-kernel depthwise conv with fp32 accumulation --
    ``reduce_window`` lowers poorly on TPU (measured ~1.5x slower) and the
    fp32 upcast it needed doubled HBM traffic; the conv reads bf16 and
    accumulates fp32, same sum-then-divide rounding as the reference.
    fp32 path: keep reduce_window (bit-exact parity; a HIGHEST-precision
    conv would still round fp32 inputs through bf16 passes).
    """
    if x.dtype == jnp.bfloat16:
        # All-bf16 so the automatic VJP stays dtype-consistent; a 9-element
        # window sum in bf16 is within ~1 ulp of the fp32 sum, matching
        # what torch AMP's fp16 pooling tolerates.
        c = x.shape[-1]
        ones = jnp.ones((3, 3, 1, c), x.dtype)
        summed = jax.lax.conv_general_dilated(
            x, ones, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return summed / jnp.bfloat16(9.0)
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return (summed / 9.0).astype(x.dtype)


class ConvX(nn.Module):
    """conv-BN-ReLU block (reference stdcnet.py:6-15).

    ``quant_mode`` (opt-in int8 PTQ, ops/quantize.py): "off" is the
    parity path; "calib" records input absmax; "int8" runs the folded
    s8xs8->s32 conv + fp32 epilogue (eval only).
    """

    out_planes: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        check_quant_mode(self.quant_mode)
        self.conv = _conv(self.out_planes, self.kernel, self.stride,
                          dtype=self.dtype)
        self.bn = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name)
        self.quant_vars = declare_quant_variables(self)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant_mode == "int8":
            if train:
                raise ValueError("int8 quant_mode is inference-only")
            if self.quant_vars is not None:  # None = filtered out -> fp
                return quantized_conv_call(self.quant_vars, x,
                                           stride=self.stride,
                                           padding=self.kernel // 2,
                                           dtype=self.dtype)
        if self.quant_mode == "calib" and not train:
            record_input_absmax(self.quant_vars, x)
        x = self.conv(x)
        x = self.bn(x, use_running_average=not train)
        return nn.relu(x)


def _chain_channels(out_planes: int, block_num: int) -> List[Tuple[int, int]]:
    """(in, out) channels of conv_list[i], reference stdcnet.py:81-92."""
    chans = []
    for idx in range(block_num):
        if idx == 0:
            chans.append((None, out_planes // 2))  # 1x1 entry
        elif idx == 1 and block_num == 2:
            chans.append((out_planes // 2, out_planes // 2))
        elif idx == 1 and block_num > 2:
            chans.append((out_planes // 2, out_planes // 4))
        elif idx < block_num - 1:
            chans.append(
                (out_planes // int(math.pow(2, idx)),
                 out_planes // int(math.pow(2, idx + 1)))
            )
        else:
            chans.append(
                (out_planes // int(math.pow(2, idx)),
                 out_planes // int(math.pow(2, idx)))
            )
    return chans


class CatBottleneck(nn.Module):
    """STDC concat bottleneck (reference stdcnet.py:66-113)."""

    out_planes: int
    block_num: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        assert self.block_num > 1, "block number should be larger than 1."
        chans = _chain_channels(self.out_planes, self.block_num)
        convs = []
        for idx, (_, out_c) in enumerate(chans):
            kernel = 1 if idx == 0 else 3
            # The inner stride lands on conv_list[1] only when the block
            # itself is stride 1; a stride-2 block moves the downsample into
            # avd_layer (reference stdcnet.py:72-79).
            s = 1
            convs.append(ConvX(out_c, kernel=kernel, stride=s,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               quant_mode=self.quant_mode))
        self.conv_list = convs
        if self.stride == 2:
            half = self.out_planes // 2
            self.avd_layer_0 = _conv(half, 3, 2, groups=half, dtype=self.dtype)
            self.avd_layer_1 = BatchNorm(dtype=self.dtype,
                                         axis_name=self.bn_axis_name)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out1 = self.conv_list[0](x, train)
        outs = []
        out = out1
        for idx, conv in enumerate(self.conv_list[1:]):
            if idx == 0 and self.stride == 2:
                d = self.avd_layer_0(out1)
                d = self.avd_layer_1(d, use_running_average=not train)
                out = conv(d, train)
            else:
                out = conv(out, train)
            outs.append(out)
        head = avg_pool_3x3_s2(out1) if self.stride == 2 else out1
        return jnp.concatenate([head] + outs, axis=-1)


class AddBottleneck(nn.Module):
    """STDC residual bottleneck (reference stdcnet.py:17-64)."""

    in_planes: int
    out_planes: int
    block_num: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        assert self.block_num > 1, "block number should be larger than 1."
        chans = _chain_channels(self.out_planes, self.block_num)
        convs = []
        for idx, (_, out_c) in enumerate(chans):
            kernel = 1 if idx == 0 else 3
            convs.append(ConvX(out_c, kernel=kernel, stride=1,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               quant_mode=self.quant_mode))
        self.conv_list = convs
        if self.stride == 2:
            half = self.out_planes // 2
            self.avd_layer_0 = _conv(half, 3, 2, groups=half, dtype=self.dtype)
            self.avd_layer_1 = BatchNorm(dtype=self.dtype,
                                         axis_name=self.bn_axis_name)
            # skip: depthwise 3x3 s2 + BN + 1x1 proj + BN
            # (reference stdcnet.py:29-34).
            self.skip_0 = _conv(self.in_planes, 3, 2, groups=self.in_planes,
                                dtype=self.dtype)
            self.skip_1 = BatchNorm(dtype=self.dtype,
                                    axis_name=self.bn_axis_name)
            self.skip_2 = _conv(self.out_planes, 1, 1, dtype=self.dtype)
            self.skip_3 = BatchNorm(dtype=self.dtype,
                                    axis_name=self.bn_axis_name)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        outs = []
        out = x
        for idx, conv in enumerate(self.conv_list):
            if idx == 0 and self.stride == 2:
                out = conv(out, train)
                out = self.avd_layer_0(out)
                out = self.avd_layer_1(out, use_running_average=not train)
            else:
                out = conv(out, train)
            outs.append(out)
        if self.stride == 2:
            x = self.skip_0(x)
            x = self.skip_1(x, use_running_average=not train)
            x = self.skip_2(x)
            x = self.skip_3(x, use_running_average=not train)
        return jnp.concatenate(outs, axis=-1) + x


class STDCNet813(nn.Module):
    """STDC1 backbone, "813" config (reference stdcnet.py:116-204)."""

    base: int = 64
    layers: Sequence[int] = (2, 2, 2)
    block_num: int = 4
    block_type: str = "cat"
    num_classes: int = 1000
    dropout: float = 0.20
    use_conv_last: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Any = None
    quant_mode: str = "off"

    def setup(self):
        if self.block_type not in ("cat", "add"):
            raise ValueError(f"unknown block type {self.block_type}")
        is_cat = self.block_type == "cat"
        base = self.base
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)

        def block(in_c, out_c, stride):
            if is_cat:
                return CatBottleneck(out_planes=out_c, block_num=self.block_num,
                                     stride=stride, **kw)
            return AddBottleneck(in_planes=in_c, out_planes=out_c,
                                 block_num=self.block_num, stride=stride, **kw)

        feats = [
            ConvX(base // 2, kernel=3, stride=2, **kw),
            ConvX(base, kernel=3, stride=2, **kw),
        ]
        # reference stdcnet.py:174-181
        for i, layer in enumerate(self.layers):
            for j in range(layer):
                if i == 0 and j == 0:
                    feats.append(block(base, base * 4, 2))
                elif j == 0:
                    feats.append(
                        block(base * int(math.pow(2, i + 1)),
                              base * int(math.pow(2, i + 2)), 2)
                    )
                else:
                    feats.append(
                        block(base * int(math.pow(2, i + 2)),
                              base * int(math.pow(2, i + 2)), 1)
                    )
        self.features = feats
        self._stage_slices = self._compute_stage_slices(len(feats),
                                                        self.layers)

        wide = max(1024, base * 16)
        self.conv_last = ConvX(wide, kernel=1, stride=1, **kw)
        self.fc = nn.Dense(wide, use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           precision=conv_precision(self.dtype))
        self.bn = BatchNorm(dtype=self.dtype)
        self.linear = nn.Dense(self.num_classes, use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               precision=conv_precision(self.dtype))
        self.drop = nn.Dropout(rate=self.dropout)

    @staticmethod
    def _compute_stage_slices(n: int, layers):
        # x2 = features[:1], x4 = [1:2], then one bottleneck group per
        # `layers` entry: x8 = [2:2+l0], x16 = [..+l1], x32 = [..:]
        # (reference stdcnet.py:134-138 hardcodes the layers=[2,2,2]
        # boundaries; deriving them keeps other configurations — e.g.
        # STDC2's [4,5,3] — from silently mis-assigning blocks to strides)
        l0, l1 = int(layers[0]), int(layers[1])
        assert n == 2 + sum(int(v) for v in layers), (n, layers)
        return [(0, 1), (1, 2), (2, 2 + l0), (2 + l0, 2 + l0 + l1),
                (2 + l0 + l1, n)]

    def __call__(self, x: jax.Array, train: bool = False):
        """Segmentation-mode forward: the five stride-2^k feature maps
        (reference stdcnet.py:185-194)."""
        x = x.astype(self.dtype)
        feats = []
        for lo, hi in self._stage_slices:
            for idx in range(lo, hi):
                x = self.features[idx](x, train)
            feats.append(x)
        if self.use_conv_last:
            feats[-1] = self.conv_last(feats[-1], train)
        return tuple(feats)

    def classify(self, x: jax.Array, train: bool = False,
                 rngs_available: bool = False):
        """ImageNet classifier forward (reference stdcnet.py:196-204):
        conv_last -> pow(2) -> GAP -> fc -> relu -> dropout -> linear.

        Note ``self.bn`` is deliberately NOT applied: the reference
        defines it (stdcnet.py:130) but ``forward_impl`` never calls it;
        it exists here only so ``.tar`` pretrain checkpoints import
        leaf-complete. We still touch it below so flax registers its
        variables under both init and apply."""
        x = x.astype(self.dtype)
        for lo, hi in self._stage_slices:
            for idx in range(lo, hi):
                x = self.features[idx](x, train)
        x = self.conv_last(x, train)
        x = jnp.square(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = self.fc(x)
        # register self.bn's params/stats without using its output
        # (reference parity: defined, never called in forward_impl)
        _ = self.bn(jax.lax.stop_gradient(x), use_running_average=True)
        x = nn.relu(x)
        x = self.drop(x, deterministic=not (train and rngs_available))
        return self.linear(x)
