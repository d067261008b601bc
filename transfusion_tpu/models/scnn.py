"""Fast-SCNN snao model: two-branch real-time trunk + heatmap/classification
heads — the lightweight member of the legacy heatmap experiment family.

TPU-native rebuild of ``modeling/snao/scnn_wrapper.py`` (SCNNWrapper,
:7-108). The wrapped network, ``modeling.fast_scnn``, is ABSENT from the
reference snapshot (the import at scnn_wrapper.py:2 fails), so the trunk is
reconstructed from two sources: the public Fast-SCNN architecture (Poudel et
al., BMVC 2019 — learning-to-downsample, global feature extractor with
MobileNetV2-style linear bottlenecks + pyramid pooling, and a two-branch
feature-fusion module), pinned to the wrapper's integration contract:

* ``forward_features`` returns ``(global_features, high_res_features)`` and
  ``feature_fusion(higher_res, lower_res)`` fuses them (scnn_wrapper.py:67-74);
* the factory config fixes the widths: ``downsample_c [24, 32, 48]``,
  ``feature_extractor_c [48, 64, 96]``, ``num_blocks [3, 3, 3]``,
  ``feature_fusion_c [48, 96, 96]``, relu activation (scnn_wrapper.py:96-104);
* the fused map sits at 1/8 input resolution
  (``get_final_dsampled_size``, scnn_wrapper.py:55-59);
* the heatmap head is ``ScnnHeatmapPred(in_ch, 1, hmap_head_upscale,
  head_k_size, dropout)`` (scnn_wrapper.py:31-33) — the shared supplied head
  in :mod:`transfusion_tpu.models.resnet_nao`;
* the classification branch is two extra linear-bottleneck stacks
  ``in -> int(in * 1.25) (3 blocks, t=4, stride 2) -> out_class_channels
  (1 block, t=4, stride 1)`` with the trunk activation between them, then
  adaptive average pooling into the standard noun/verb/ttc heads
  (scnn_wrapper.py:35-48,76-82).

The linear bottleneck reuses :class:`~transfusion_tpu.models.mobilenet.
InvertedResidual` (``use_se=False, activation="relu"`` IS the MobileNetV2
linear bottleneck). TPU notes: NHWC; every conv is BN-folded (frozen affine);
the pyramid pooling pools to static bin counts so shapes stay static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.misc_layers import get_upsample_l
from transfusion_tpu.models.mobilenet import ConvBN, InvertedResidual
from transfusion_tpu.models.resnet_nao import (HeatmapHead, _head,
                                               forward_multivar)


@dataclass(frozen=True)
class ScnnNaoConfig:
    """get_test_scnn_wraper's model_config + the NaoWrapperBase head flags
    (scnn_wrapper.py:85-108, commons.py:176-196)."""

    downsample_c: Sequence[int] = (24, 32, 48)
    feature_extractor_c: Sequence[int] = (48, 64, 96)
    num_blocks: Sequence[int] = (3, 3, 3)
    feature_fusion_c: Sequence[int] = (48, 96, 96)
    out_class_channels: int = 512
    noun_classes: int = 0
    verb_classes: int = 0
    ttc_pred: bool = False
    heatmap_pred: bool = True
    multivar_n: bool = False
    w_sigmoid: bool = False
    kl_div: bool = False
    class_dropout: float = 0.25
    ttc_dropout: float = 0.25
    hmap_dropout: float = 0.25
    head_k_size: int = 3
    hmap_head_upscale: float = 1.0
    upsample_kind: str = "bilinear"
    dtype: Any = jnp.float32

    @property
    def classifying(self) -> bool:
        return self.noun_classes > 0 or self.verb_classes > 0


class DSConv(nn.Module):
    """Depthwise-separable conv: 3x3 depthwise + BN + relu, 1x1 + BN + relu."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(x.shape[-1], 3, self.stride, groups=x.shape[-1],
                   activation="relu", dtype=self.dtype, name="depthwise")(x)
        return ConvBN(self.features, 1, 1, activation="relu",
                      dtype=self.dtype, name="pointwise")(x)


class PyramidPooling(nn.Module):
    """PSPNet-style pooling over static {1, 2, 3, 6} bins, each reduced to
    C/4 and upsampled back, concatenated with the input, projected to C."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        branch = self.features // 4
        up = get_upsample_l("bilinear")(branch)
        outs = [x]
        for i, bins in enumerate((1, 2, 3, 6)):
            kh, kw = max(h // bins, 1), max(w // bins, 1)
            p = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
            p = ConvBN(branch, 1, 1, activation="relu", dtype=self.dtype,
                       name=f"pool{i}")(p)
            outs.append(up(p.astype(jnp.float32), (h, w)).astype(x.dtype))
        x = jnp.concatenate(outs, axis=-1)
        return ConvBN(self.features, 1, 1, activation="relu",
                      dtype=self.dtype, name="project")(x)


def _bottleneck_stack(x, out: int, blocks: int, t: int, stride: int, dtype,
                      name: str):
    """_make_layer(LinearBottleneck, ...) (scnn_wrapper.py:36-46): first
    block carries the stride, the rest are stride-1 residuals."""
    for b in range(blocks):
        inp = x.shape[-1]
        x = InvertedResidual(
            kernel=3, expanded=t * inp, out=out, use_se=False,
            activation="relu", stride=stride if b == 0 else 1, dtype=dtype,
            name=f"{name}_{b}",
        )(x)
    return x


class ScnnFeatures(nn.Module):
    """The Fast-SCNN trunk: ``forward_features`` -> (global, high_res),
    ``feature_fusion`` -> fused 1/8-resolution map (the get_fast_scnn model
    the wrapper consumes, scnn_wrapper.py:67-74)."""

    cfg: ScnnNaoConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        c0, c1, c2 = cfg.downsample_c
        # Learning to downsample: 1/2 -> 1/4 -> 1/8.
        h = ConvBN(c0, 3, 2, activation="relu", dtype=cfg.dtype, name="ltd_conv")(images)
        h = DSConv(c1, 2, cfg.dtype, name="ltd_ds1")(h)
        high_res = DSConv(c2, 2, cfg.dtype, name="ltd_ds2")(h)

        # Global feature extractor: strides (2, 2, 1) -> 1/32, then PPM.
        g = high_res
        for i, (c, n) in enumerate(zip(cfg.feature_extractor_c, cfg.num_blocks)):
            g = _bottleneck_stack(g, c, n, t=6, stride=2 if i < 2 else 1,
                                  dtype=cfg.dtype, name=f"gfe{i}")
        g = PyramidPooling(cfg.feature_extractor_c[-1], cfg.dtype, name="ppm")(g)

        # Feature fusion: upsample global x4, depthwise-refine, 1x1 both
        # branches to the fusion width, add, relu.
        fuse_out = cfg.feature_fusion_c[-1]
        hh, hw = high_res.shape[1:3]
        up = get_upsample_l("bilinear")(g.shape[-1])
        low = up(g.astype(jnp.float32), (hh, hw)).astype(g.dtype)
        low = ConvBN(low.shape[-1], 3, 1, groups=low.shape[-1], activation="relu",
                     dtype=cfg.dtype, name="ff_dwconv")(low)
        low = ConvBN(fuse_out, 1, 1, activation=None, dtype=cfg.dtype,
                     name="ff_low")(low)
        high = ConvBN(fuse_out, 1, 1, activation=None, dtype=cfg.dtype,
                      name="ff_high")(high_res)
        return nn.relu(low + high)


class ScnnNao(nn.Module):
    """The full SCNNWrapper forward: fused trunk features -> heatmap branch +
    classification branch -> last_stage (scnn_wrapper.py:31-82 over
    commons.py:111-149). Output contract matches
    :class:`~transfusion_tpu.models.resnet_nao.ResnetNao`."""

    cfg: ScnnNaoConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        cfg = self.cfg
        feat = ScnnFeatures(cfg, name="trunk")(images)

        heatmap = None
        if cfg.heatmap_pred:
            hm = HeatmapHead(feat.shape[-1], cfg.hmap_head_upscale,
                             cfg.head_k_size, cfg.hmap_dropout, cfg.dtype,
                             name="heatmap_head")(feat, deterministic)
            if cfg.multivar_n:
                heatmap = forward_multivar(self, hm, cfg.hmap_dropout, deterministic)
            else:
                heatmap = hm

        cls_f = None
        if cfg.classifying or cfg.ttc_pred:
            in_ch = feat.shape[-1]
            c = _bottleneck_stack(feat, int(in_ch * 1.25), blocks=3, t=4,
                                  stride=2, dtype=cfg.dtype, name="bottleneck_1")
            c = nn.relu(c)
            c = _bottleneck_stack(c, cfg.out_class_channels, blocks=1, t=4,
                                  stride=1, dtype=cfg.dtype, name="bottleneck_2")
            c = nn.relu(c)
            cls_f = jnp.mean(c, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten

        noun_logits = _head(cls_f, cfg.noun_classes, cfg.class_dropout, deterministic,
                            "noun_classifier", dtype=cfg.dtype) if cfg.noun_classes else None
        verb_logits = _head(cls_f, cfg.verb_classes, cfg.class_dropout, deterministic,
                            "verb_classifier", dtype=cfg.dtype) if cfg.verb_classes else None
        ttc = (_head(cls_f, 1, cfg.ttc_dropout, deterministic, "ttc_predictor",
                     activ="softplus", dtype=cfg.dtype)[:, 0] if cfg.ttc_pred else None)

        x = heatmap
        if cfg.heatmap_pred and not cfg.multivar_n:
            if cfg.w_sigmoid:
                x = nn.sigmoid(x)
            im_size = images.shape[1:3]
            if tuple(im_size) != tuple(x.shape[1:3]):
                up = get_upsample_l(cfg.upsample_kind)(1)
                x = up(x[..., None].astype(jnp.float32), tuple(im_size))[..., 0]
            if cfg.kl_div:
                b, hh, wh = x.shape
                x = nn.log_softmax(x.reshape(b, -1).astype(jnp.float32),
                                   axis=-1).reshape(b, hh, wh)
        return {"heatmap": x, "noun_logits": noun_logits,
                "verb_logits": verb_logits, "ttc": ttc}
