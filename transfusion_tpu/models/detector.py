"""Faster R-CNN detector assembly, mirroring the reference's 3-phase seam.

The reference decomposes its forward into ``forward_features`` (transform +
backbone body), ``apply_fpn`` and ``apply_rpn_roi_on_features``
(``modeling/obj_detection/faster_rcnn_wrapper.py:165-201,375-421``) precisely
so the cross-modal fusion can rewrite backbone features before the FPN. We
keep the same seam as flax module methods; the multiscale image resize +
normalization live in the host data pipeline (static bucketed shapes), not in
the model.

Training forward returns raw logits + sampled labels/targets (losses live in
the trainer, matching ``roi_wrappers.py:36``); inference postprocessing is a
separate pure function so it can run in the same jit or standalone.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.models.fpn import FPN
from transfusion_tpu.models.resnet import ResNet
from transfusion_tpu.models.roi_heads import (
    BoxHead,
    RoIConfig,
    RoIPredictors,
    postprocess_detections,
    select_training_samples,
)
from transfusion_tpu.models.rpn import (
    RPNConfig,
    RPNHead,
    assign_targets_to_anchors,
    generate_proposals,
)
from transfusion_tpu.ops.roi_align import multiscale_roi_align


@dataclass(frozen=True)
class DetectorConfig:
    roi: RoIConfig = field(default_factory=RoIConfig)
    rpn: RPNConfig = field(default_factory=RPNConfig)
    fpn_out_channels: int = 256
    stride_in_1x1: bool = True  # adapt_to_detectron
    stage_sizes: tuple = (3, 4, 6, 3)  # ResNet-50; smaller for smoke tests
    # model.type (rcnn_factory.py:25-32): res50 | mobilenet | mobilenet_320.
    # The 320 variant differs only in resize/rpn defaults, which live in the
    # run config here; both map onto the MobileNetV3-Large trunk.
    backbone: str = "res50"
    # model.batch_norm (replace_frozen_bn, obj_detection/utils.py:3-57).
    trainable_bn: bool = False
    bn_momentum: float = 0.1
    # Additive TPU knob: exact space-to-depth stem (see resnet.ResNet).
    s2d_stem: bool = False
    # Frozen-prefix gradient cut (see resnet.ResNet.stop_grad_prefix):
    # number of leading [stem, layer1..layer4] units whose backward is
    # elided. Updates stay bit-identical to grad masking because nothing
    # trainable is upstream of the cut; the trainer sets this per epoch from
    # train_ep/trainable_layers (faster_rcnn_wrapper.py:135-146).
    stop_grad_stages: int = 0
    # Legacy two-stream variant (DualStreamRCNNWrapper,
    # dual_stream_rcnn_wrapper.py:12-94): the backbone also consumes an
    # optical-flow input fused into every residual block (models/dual_stream).
    # Unreachable from shipped reference configs (model_factory.py:55).
    dual_stream: bool = False
    flow_fusion: str = "sum"
    dtype: Any = jnp.float32


class FasterRCNN(nn.Module):
    cfg: DetectorConfig

    def setup(self):
        if self.cfg.dual_stream:
            from transfusion_tpu.models.dual_stream import DualStreamResNet

            self.backbone = DualStreamResNet(
                stage_sizes=self.cfg.stage_sizes,
                stride_in_1x1=self.cfg.stride_in_1x1,
                fusion=self.cfg.flow_fusion,
                dtype=self.cfg.dtype,
            )
        elif self.cfg.backbone.startswith("mobilenet"):
            from transfusion_tpu.models.mobilenet import MobileNetV3Features

            self.backbone = MobileNetV3Features(dtype=self.cfg.dtype)
        else:
            self.backbone = ResNet(
                stage_sizes=self.cfg.stage_sizes,
                stride_in_1x1=self.cfg.stride_in_1x1,
                dtype=self.cfg.dtype,
                trainable_bn=self.cfg.trainable_bn,
                bn_momentum=self.cfg.bn_momentum,
                s2d_stem=self.cfg.s2d_stem,
                stop_grad_prefix=self.cfg.stop_grad_stages,
            )
        self.fpn = FPN(out_channels=self.cfg.fpn_out_channels, dtype=self.cfg.dtype)
        self.rpn_head = RPNHead(num_anchors=len(self.cfg.rpn.aspect_ratios), dtype=self.cfg.dtype)
        self.box_head = BoxHead(self.cfg.roi.representation_size, dtype=self.cfg.dtype)
        self.predictors = RoIPredictors(self.cfg.roi, dtype=self.cfg.dtype)

    def forward_features(self, images, train: bool = False, flow=None):
        """Backbone body only — the fusion seam operates on this dict.
        ``train`` only matters under trainable BN (batch-stat updates).
        ``flow`` feeds the dual-stream backbone (x["flow_data"],
        dual_stream_rcnn_wrapper.py:38-41)."""
        if self.cfg.dual_stream:
            assert flow is not None, "dual_stream=True requires a flow input"
            return self.backbone(images, flow, train)
        if self.cfg.trainable_bn and not self.cfg.backbone.startswith("mobilenet"):
            return self.backbone(images, train)
        return self.backbone(images)

    def apply_fpn(self, feats):
        return self.fpn(feats)

    def apply_rpn_roi(self, fpn_feats, image_hw, targets=None, train: bool = False,
                      sample: bool | None = None):
        """RPN + RoI heads over FPN features.

        Returns the reference's output contract: {"roi_outputs", "proposals",
        "image_sizes"} with raw logits + labels for external losses.

        ``sample`` decouples target assignment/RoI sampling from ``train``
        (dropout / proposal counts): validation losses need sampled labels on
        a deterministic eval forward (the reference's validation_step stacks
        constant-zero losses instead, ego_nao_trainer.py:407-427 — here the
        real losses are computed).
        """
        if sample is None:
            sample = train
        objectness, deltas = self.rpn_head(fpn_feats)
        rpn_out = generate_proposals(objectness, deltas, image_hw, self.cfg.rpn, train)

        if sample:
            assert targets is not None
            labels, matches = assign_targets_to_anchors(
                rpn_out["anchors"], targets["boxes"], targets["valid"], self.cfg.rpn
            )
            rpn_out["labels"] = labels
            rpn_out["matches"] = matches
            sampled = select_training_samples(
                self.make_rng("sampling"), rpn_out["boxes"], rpn_out["valid"], targets, self.cfg.roi
            )
            rois, roi_valid = sampled["rois"], sampled["valid"]
        else:
            sampled = None
            rois, roi_valid = rpn_out["boxes"], rpn_out["valid"]

        pooled = multiscale_roi_align(
            {k: v for k, v in fpn_feats.items() if k.isdigit()}, rois, image_hw
        )
        if self.cfg.roi.box_1_dropout:
            pooled = nn.Dropout(self.cfg.roi.box_1_dropout, deterministic=not train)(pooled)
        box_features = self.box_head(pooled)
        preds = self.predictors(box_features, deterministic=not train)

        roi_outputs = {
            **preds,
            "proposals": rois,
            "proposals_valid": roi_valid,
        }
        if sampled is not None:
            roi_outputs["labels"] = (sampled["nouns"], sampled["verbs"], sampled["ttcs"])
            roi_outputs["reg_targets"] = sampled["reg_targets"]

        return {
            "roi_outputs": roi_outputs,
            "proposals": rpn_out,
            "image_sizes": image_hw,
        }

    def __call__(self, images, image_hw, targets=None, train: bool = False, flow=None):
        feats = self.forward_features(images, train, flow=flow)
        fpn_feats = self.apply_fpn(feats)
        return self.apply_rpn_roi(fpn_feats, image_hw, targets, train)


def detections_from_outputs(
    outputs: dict,
    cfg: DetectorConfig,
    noun_verb_frequencies=None,
    training: bool = False,
):
    """The reference's ``dets_from_outs`` equivalent
    (faster_rcnn_wrapper.py:208-269, linear-TTC path): postprocess raw RoI
    outputs into per-image top-k detections."""
    roi = outputs["roi_outputs"]
    return postprocess_detections(
        roi,
        roi["proposals"],
        roi["proposals_valid"],
        outputs["image_sizes"],
        cfg.roi,
        noun_verb_frequencies=noun_verb_frequencies,
        training=training,
    )


def rescale_boxes(boxes: jnp.ndarray, from_hw, to_hw) -> jnp.ndarray:
    """torchvision resize_boxes: independent x/y ratios.

    from_hw/to_hw: [B, 2] arrays (h, w) or tuples.
    """
    from_hw = jnp.asarray(from_hw, dtype=boxes.dtype)
    to_hw = jnp.asarray(to_hw, dtype=boxes.dtype)
    if from_hw.ndim == 1:
        from_hw = from_hw[None]
    if to_hw.ndim == 1:
        to_hw = to_hw[None]
    ry = (to_hw[:, 0] / from_hw[:, 0])[:, None]
    rx = (to_hw[:, 1] / from_hw[:, 1])[:, None]
    return jnp.stack(
        [boxes[..., 0] * rx, boxes[..., 1] * ry, boxes[..., 2] * rx, boxes[..., 3] * ry],
        axis=-1,
    )
