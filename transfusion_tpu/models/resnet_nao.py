"""Plain-ResNet snao model: heatmap and/or classification over a truncated
trunk — the legacy non-fusion baseline of the heatmap experiment family.

TPU-native rebuild of ``modeling/resnet/resnet_wrapper.py`` (ResnetWrapper,
:112-210) with the head/branch semantics of ``modeling/commons.py`` (NaoABC
:44-164 / NaoWrapperBase :167-215): a torchvision-style ResNet is cut after
``heatmap_blocks`` stages (downsample factor ``2**(heatmap_blocks+1)``,
resnet_wrapper.py:126); the truncated feature map feeds a 1-channel heatmap
head, while classification keeps the remaining stages and global-average-pools
into Dropout+Linear noun/verb heads and a softplus TTC head (get_dnn,
commons.py:18-30; setup_classifiers :75-83; classif_branch
resnet_wrapper.py:185-190).

REACHABILITY + supplied pieces (this is dead code in the reference — the
factory raises for every experiment except "egonao", factories.py:11-20):

* ``NaoWrapperBase.heatmap_from_features`` calls ``self.heatmap_head``
  (commons.py:215) but ``ResnetWrapper`` never creates one — running the
  heatmap path raises AttributeError. The only constructor in the tree is
  ``ScnnHeatmapPred(in_ch, 1, hmap_head_upscale, head_k_size, dropout)``
  from ``modeling.fast_scnn`` (scnn_wrapper.py:31-33), a module absent from
  the snapshot. We supply a head with that signature's shape:
  ``Conv(int(in_ch * hmap_head_upscale), k) -> relu -> Dropout -> Conv(1, 1)``.
* ``forward_multivar`` slices ``tril = outputs[:, 3]`` and
  ``diag = outputs[:, 3:]`` (commons.py:103) — index 2 of the 5-way MLP
  output is dead and the off-diagonal aliases the first diagonal entry.
  Implemented with the intended split loc=[:2], tril=[2], diag=[3:].
* The ``mesh_x_8``/``mesh_y_8`` buffers are registered but never read
  (commons.py:89-94) — dropped.

TPU notes: NHWC; the trunk reuses the same ``Bottleneck`` blocks as the
detector backbone (frozen-BN affine folds into the convs); in heatmap-only
mode the tail stages are never built (``cut_blocks_up_to``,
resnet_wrapper.py:192-193), so no dead parameters or FLOPs exist.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.misc_layers import get_upsample_l
from transfusion_tpu.models.resnet import Bottleneck, ConvNorm


@dataclass(frozen=True)
class ResnetNaoConfig:
    """ResnetWrapper ctor args + the criterion-derived flags
    (resnet_wrapper.py:113-152, commons.py:176-196)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # res50; (2,2,2,2) = res18 geometry
    heatmap_blocks: int = 3
    noun_classes: int = 0  # criterion["noun"] > 0 -> classify
    verb_classes: int = 0
    ttc_pred: bool = False
    heatmap_pred: bool = True  # is_heatmap_pred_on: mae/mse/multivar_n (commons.py:230-231)
    multivar_n: bool = False
    w_sigmoid: bool = False
    kl_div: bool = False
    class_dropout: float = 0.2
    ttc_dropout: float = 0.2
    hmap_dropout: float = 0.25
    head_k_size: int = 3
    hmap_head_upscale: float = 1.0
    upsample_kind: str = "bilinear"
    # resize_spec drives the multivar MLP input size:
    # prod(resize_spec // 2**(heatmap_blocks+1)) (resnet_wrapper.py:161-162).
    resize_spec: Sequence[int] = (192, 384)
    dtype: Any = jnp.float32

    @property
    def classifying(self) -> bool:
        return self.noun_classes > 0 or self.verb_classes > 0

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.heatmap_blocks + 1)


class HeatmapHead(nn.Module):
    """Supplied 1-channel head (see module docstring): the ScnnHeatmapPred
    signature shape (scnn_wrapper.py:31-33) over the truncated trunk."""

    in_ch: int
    upscale: float = 1.0
    k: int = 3
    dropout: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = max(1, int(round(self.in_ch * self.upscale)))
        pad = (self.k - 1) // 2
        x = nn.Conv(hidden, (self.k, self.k), padding=((pad, pad), (pad, pad)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv2")(x)
        return x[..., 0]  # [B, H, W]


def _head(x, classes, dropout, deterministic, name, activ=None, dtype=jnp.float32):
    """get_dnn (commons.py:18-30): Dropout -> Linear [-> activation]."""
    x = nn.Dropout(dropout, deterministic=deterministic, name=f"{name}_drop")(x)
    x = nn.Dense(classes, dtype=dtype, name=name)(x)
    if activ == "softplus":
        x = nn.softplus(x)
    return x


def forward_multivar(mdl: nn.Module, hm, dropout: float, deterministic: bool):
    """forward_multivar (commons.py:100-109) with the intended index split
    (see module docstring): 5-way MLP over the flattened map -> loc +
    lower-triangular scale. Call from inside a compact ``__call__`` — params
    land in the caller's scope (shared by ResnetNao and ScnnNao)."""
    b = hm.shape[0]
    flat = nn.Dropout(dropout, deterministic=deterministic,
                      name="dist_dropout")(hm.reshape(b, -1))
    outputs = nn.Dense(5, dtype=jnp.float32, name="dist_mlp")(flat)
    offset_stds = mdl.param("offset_stds", nn.initializers.ones, (2,))
    loc, tril, diag = outputs[:, :2], outputs[:, 2], outputs[:, 3:]
    diag = 1.0 + offset_stds + nn.elu(diag)
    zeros = jnp.zeros((b,), diag.dtype)
    scale_tril = jnp.stack(
        [diag[:, 0], zeros, tril, diag[:, 1]], axis=-1).reshape(b, 2, 2)
    return {"loc": loc, "scale_tril": scale_tril}


class ResnetNao(nn.Module):
    """forward (commons.py:111-116): features -> heatmap branch + classif
    branch -> last_stage. Returns {"heatmap", "noun_logits", "verb_logits",
    "ttc"}; under ``multivar_n`` the heatmap slot is the distribution params
    ``{"loc": [B, 2], "scale_tril": [B, 2, 2]}`` (commons.py:100-109,138-139).
    """

    cfg: ResnetNaoConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        cfg = self.cfg
        h = nn.relu(ConvNorm(64, 7, 2, cfg.dtype, name="stem")(images))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # Heatmap-only mode drops the tail stages entirely
        # (cut_blocks_up_to, resnet_wrapper.py:149,192-193).
        n_stages = (len(cfg.stage_sizes)
                    if (cfg.classifying or cfg.ttc_pred) else cfg.heatmap_blocks)
        feat = None
        mid = 64
        for stage in range(n_stages):
            stride = 1 if stage == 0 else 2
            for b in range(cfg.stage_sizes[stage]):
                h = Bottleneck(
                    mid=mid, stride=stride if b == 0 else 1,
                    stride_in_1x1=False,  # plain torchvision resnet, no d2 adaptation
                    project=(b == 0), dtype=cfg.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(h)
            if stage + 1 == cfg.heatmap_blocks:
                feat = h
            mid *= 2

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
            cls_f = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten

        noun_logits = _head(cls_f, cfg.noun_classes, cfg.class_dropout, deterministic,
                            "noun_classifier", dtype=cfg.dtype) if cfg.noun_classes else None
        verb_logits = _head(cls_f, cfg.verb_classes, cfg.class_dropout, deterministic,
                            "verb_classifier", dtype=cfg.dtype) if cfg.verb_classes else None
        ttc = (_head(cls_f, 1, cfg.ttc_dropout, deterministic, "ttc_predictor",
                     activ="softplus", dtype=cfg.dtype)[:, 0] if cfg.ttc_pred else None)

        # last_stage (commons.py:130-149): sigmoid -> upsample to the input
        # resolution (multivar returns the dist params instead).
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
