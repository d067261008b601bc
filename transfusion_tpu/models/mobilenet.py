"""MobileNetV3-Large detection backbone.

The reference's ``model.type: mobilenet / mobilenet_320`` path
(``modeling/obj_detection/mobilenet_fpn_utils.py:15-159`` +
``rcnn_factory.py:25-32``) wraps torchvision's
``fasterrcnn_mobilenet_v3_large[_320]_fpn`` with configurable FPN return
layers. This is the flax equivalent of torchvision's ``mobilenet_v3_large``
feature trunk with detection-style FrozenBN (stats baked at translation time,
like the ResNet path) and the ``mobilenet_backbone`` stage outputs:
``returned_layers [1, 2, 3, 4]`` -> strides 4/8/16/32 with channels
24/40/80/160, feeding the same FPN/RPN/RoI stack as ResNet-50.

NHWC throughout; hardswish/relu activations; squeeze-excitation where
torchvision has it.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.resnet import FrozenBatchNorm

# (kernel, expanded, out, use_se, activation, stride) — torchvision
# mobilenet_v3_large inverted_residual_setting.
_LARGE_SETTINGS = (
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
)

# Stage split points (torchvision mobilenet_backbone: blocks with _is_cn,
# i.e. stride > 1) and the channels the FPN sees for returned_layers
# [1, 2, 3, 4].
MOBILENET_CHANNELS = {"0": 24, "1": 40, "2": 80, "3": 160}


def _act(name: str):
    return nn.hard_swish if name == "hardswish" else nn.relu


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    activation: str | None = "hardswish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        # torchvision MobileNetV3 BN eps is 1e-3 (vs ResNet's 1e-5).
        x = FrozenBatchNorm(self.features, eps=1e-3, dtype=self.dtype, name="bn")(x)
        if self.activation:
            x = _act(self.activation)(x)
        return x


class SqueezeExcite(nn.Module):
    """torchvision SElayer: squeeze -> relu -> hardsigmoid scale; the hidden
    width is in_channels // 4 rounded to a multiple of 8."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(8, int((self.channels // 4 + 4) // 8) * 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    activation: str
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        h = x
        if self.expanded != inp:
            h = ConvBN(self.expanded, 1, 1, activation=self.activation,
                       dtype=self.dtype, name="expand")(h)
        h = ConvBN(self.expanded, self.kernel, self.stride, groups=self.expanded,
                   activation=self.activation, dtype=self.dtype, name="depthwise")(h)
        if self.use_se:
            h = SqueezeExcite(self.expanded, dtype=self.dtype, name="se")(h)
        h = ConvBN(self.out, 1, 1, activation=None, dtype=self.dtype, name="project")(h)
        if self.stride == 1 and inp == self.out:
            h = h + x
        return h


class MobileNetV3Features(nn.Module):
    """Feature trunk returning the detection stage dict {"0".."3"} at strides
    4/8/16/32 (outputs of the first block of each stride-2 stage, matching
    torchvision's IntermediateLayerGetter over stage_indices [2, 4, 7, 13])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = {}
        x = ConvBN(16, 3, 2, activation="hardswish", dtype=self.dtype, name="stem")(x)
        grab = {1: "0", 3: "1", 6: "2", 12: "3"}  # 0-based block index -> level
        for i, (k, exp, c, se, act, s) in enumerate(_LARGE_SETTINGS):
            x = InvertedResidual(k, exp, c, se, act, s, dtype=self.dtype, name=f"block_{i}")(x)
            if i in grab:
                out[grab[i]] = x
        return out
