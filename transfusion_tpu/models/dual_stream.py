"""Dual-stream (RGB + optical flow) backbone for the legacy two-stream RCNN.

Rebuild of ``modeling/obj_detection/dual_stream_rcnn_wrapper.py`` (the
forward contract taking ``x = {"image", "flow_data"}`` and a backbone
consuming both, :38-94) plus the block-level fusion adapters in
``modeling/resnet/resnet_wrapper.py`` (ResNetBasicBDualWrapper /
ResNetBneckBDualWrapper, :54-109): the motion feature is fused into every
residual block's INPUT, and a projecting shortcut sees the FUSED input while
an identity shortcut sees the pre-fusion input (:87-107 — ``identity = x``
binds before ``x = fusion_fn(x, extra)``; ``downsample(x)`` after).

REACHABILITY + the concrete fusion: the reference never constructs this
model — ``model_factory.py:55`` hardcodes ``dual_stream=False`` and no
shipped code builds the fused backbone or the ``fusion_fn`` the adapters
expect (only ``model_loading.get_flow_adapter_w_weights`` hints at a
separately pretrained "motion stream"). We therefore supply the motion
stream (a thin ResNet over the 2-channel flow input, one bottleneck per
stage) and two standard fusion functions:

* ``sum``    — 1x1-conv-project the motion feature to the block's channel
               count and add (residual-style injection);
* ``concat`` — channel-concat then 1x1-conv back to the block's channels.

TPU notes: NHWC, static shapes, and the fusion projection is a 1x1 conv XLA
folds into the block's first matmul-shaped conv; the motion trunk is ~6% of
the RGB trunk's FLOPs.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.resnet import ConvNorm


class FlowFusion(nn.Module):
    """fusion_fn(x, extra) (resnet_wrapper.py:63,90)."""

    kind: str = "sum"  # "sum" | "concat"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, extra):
        if self.kind == "sum":
            proj = nn.Conv(x.shape[-1], (1, 1), use_bias=False, dtype=self.dtype,
                           name="proj")(extra)
            return x + proj
        if self.kind == "concat":
            cat = jnp.concatenate([x, extra.astype(x.dtype)], axis=-1)
            return nn.Conv(x.shape[-1], (1, 1), use_bias=False, dtype=self.dtype,
                           name="proj")(cat)
        raise ValueError(f"flow fusion kind {self.kind!r} not implemented")


class DualBottleneck(nn.Module):
    """Bottleneck with the motion feature fused at the block input
    (ResNetBneckBDualWrapper, resnet_wrapper.py:81-109). The projecting
    shortcut consumes the FUSED input; the identity shortcut the original."""

    mid: int
    stride: int = 1
    stride_in_1x1: bool = False
    project: bool = False
    fusion: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, extra, train: bool = False):
        out_ch = self.mid * 4
        s1, s2 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        identity = x
        x = FlowFusion(self.fusion, self.dtype, name="fuse")(x, extra)
        h = nn.relu(ConvNorm(self.mid, 1, s1, self.dtype, name="conv1")(x, train))
        h = nn.relu(ConvNorm(self.mid, 3, s2, self.dtype, name="conv2")(h, train))
        h = ConvNorm(out_ch, 1, 1, self.dtype, name="conv3")(h, train)
        if self.project:
            identity = ConvNorm(out_ch, 1, self.stride, self.dtype, name="downsample")(x, train)
        return nn.relu(h + identity)


class DualStreamResNet(nn.Module):
    """RGB trunk with per-block motion fusion; returns the same
    {"0".."3"} stage-feature dict as :class:`~transfusion_tpu.models.resnet.ResNet`
    so the FPN/RPN/RoI stack is reused unchanged.

    The motion stream mirrors the RGB geometry (7x7/s2 stem + maxpool, one
    stride-2 bottleneck per stage at quarter width), so each stage's motion
    feature matches the spatial dims of every RGB block input in that stage.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stride_in_1x1: bool = True
    fusion: str = "sum"
    flow_width: int = 16  # motion stem channels (quarter of the RGB stem)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, flow, train: bool = False):
        h = nn.relu(ConvNorm(64, 7, 2, self.dtype, name="stem")(images, train))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        m = nn.relu(ConvNorm(self.flow_width, 7, 2, self.dtype, name="flow_stem")(
            flow.astype(self.dtype), train))
        m = nn.max_pool(m, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        mid = 64
        fmid = self.flow_width
        for stage, blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            # Motion stage feature first. Block 0's input still sits at the
            # PREVIOUS resolution (the stride lives inside the block), so it
            # fuses the pre-stage motion feature; later blocks fuse the
            # strided one — fusion always happens at the block's own input
            # resolution (the adapters' contract, resnet_wrapper.py:60-63).
            m_in = m
            fm = fmid
            ms1, ms2 = (stride, 1) if self.stride_in_1x1 else (1, stride)
            mh = nn.relu(ConvNorm(fm, 1, ms1, self.dtype, name=f"flow{stage + 1}_conv1")(m, train))
            mh = nn.relu(ConvNorm(fm, 3, ms2, self.dtype, name=f"flow{stage + 1}_conv2")(mh, train))
            mh = ConvNorm(fm * 4, 1, 1, self.dtype, name=f"flow{stage + 1}_conv3")(mh, train)
            mi = ConvNorm(fm * 4, 1, stride, self.dtype, name=f"flow{stage + 1}_down")(m, train)
            m = nn.relu(mh + mi)

            for b in range(blocks):
                h = DualBottleneck(
                    mid=mid,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    project=(b == 0),
                    fusion=self.fusion,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(h, m_in if b == 0 else m, train)
            feats[str(stage)] = h
            mid *= 2
            fmid *= 2
        return feats
