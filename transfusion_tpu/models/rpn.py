"""Region proposal network, static-shape.

Mirrors the reference's unwrapped RPN
(``modeling/obj_detection/wrapper_utils.py:102-170``): the head + anchor
decode + ``filter_proposals`` produce proposals, while objectness/delta logits
and anchor-matched targets are returned raw so the loss lives in the trainer.

Static-shape translation of torchvision ``filter_proposals``:
per-level top-k (static k), concat, sigmoid scores, clip, min-size and
score-threshold masks, per-level NMS via ``class_nms_multi`` with the level id
as the class, then a fixed ``post_nms_top_n`` slots with a validity mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.models.anchors import grid_anchors
from transfusion_tpu.ops import BoxCoder, box_iou, clip_boxes, match_proposals, small_box_mask
from transfusion_tpu.ops.nms import class_nms_multi


@dataclass(frozen=True)
class RPNConfig:
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    score_thresh: float = 0.0
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    min_size: float = 1e-3
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)

    def pre_nms_top_n(self, training: bool) -> int:
        return self.pre_nms_top_n_train if training else self.pre_nms_top_n_test

    def post_nms_top_n(self, training: bool) -> int:
        return self.post_nms_top_n_train if training else self.post_nms_top_n_test


class RPNHead(nn.Module):
    """3x3 conv + relu, then 1x1 objectness / 1x1 box deltas (torchvision head)."""

    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        objectness, deltas = {}, {}
        for k, f in feats.items():
            h = nn.relu(conv(f))
            objectness[k] = cls(h)
            deltas[k] = reg(h)
        return objectness, deltas


def _flatten_levels(per_level: dict[str, jnp.ndarray], last_dim: int, keys) -> jnp.ndarray:
    """[B, H, W, A*D] per level -> [B, sum(HWA), D] in torch's (H, W, A) order."""
    parts = []
    for k in keys:
        x = per_level[k]
        b = x.shape[0]
        parts.append(x.reshape(b, -1, last_dim))
    return jnp.concatenate(parts, axis=1)


def rpn_level_keys(feats: dict[str, jnp.ndarray]) -> list[str]:
    """RPN consumes every non-hand feature map, pool level last
    (torchvision OrderedDict order: '0','1','2','3','pool')."""
    keys = sorted([k for k in feats if k.isdigit()], key=int)
    if "pool" in feats:
        keys.append("pool")
    return keys


def generate_proposals(
    objectness: dict[str, jnp.ndarray],
    deltas: dict[str, jnp.ndarray],
    image_hw: tuple[int, int],
    cfg: RPNConfig,
    training: bool,
):
    """Decode + filter proposals. Returns dict with static-shape arrays.

    image_hw is the padded (static) image size; per-image valid sizes are
    assumed equal across the batch (bucketed resize), matching clip behavior.
    """
    keys = rpn_level_keys(objectness)
    feature_shapes = [objectness[k].shape[1:3] for k in keys]
    anchors_np = grid_anchors(
        feature_shapes, image_hw, cfg.anchor_sizes[-len(keys):] if len(keys) != 5 else cfg.anchor_sizes,
        cfg.aspect_ratios,
    )

    # Proposal decode/NMS in f32 independent of the model compute dtype.
    obj = _flatten_levels(objectness, 1, keys)[..., 0].astype(jnp.float32)  # [B, N]
    dlt = _flatten_levels(deltas, 4, keys).astype(jnp.float32)  # [B, N, 4]
    bsz = obj.shape[0]

    coder = BoxCoder((1.0, 1.0, 1.0, 1.0))
    pre_n = cfg.pre_nms_top_n(training)

    sel_boxes, sel_scores, sel_levels = [], [], []
    offset = 0
    for lvl, anch in enumerate(anchors_np):
        n_l = anch.shape[0]
        obj_l = jax.lax.stop_gradient(obj[:, offset : offset + n_l])
        dlt_l = jax.lax.stop_gradient(dlt[:, offset : offset + n_l])
        offset += n_l
        k = min(pre_n, n_l)
        top_scores, top_idx = jax.lax.top_k(obj_l, k)
        top_deltas = jnp.take_along_axis(dlt_l, top_idx[..., None], axis=1)
        top_anchors = jnp.asarray(anch)[top_idx]
        boxes = coder.decode(top_deltas, top_anchors)
        sel_boxes.append(boxes)
        sel_scores.append(top_scores)
        sel_levels.append(jnp.full((bsz, k), lvl, dtype=jnp.int32))

    boxes = jnp.concatenate(sel_boxes, axis=1)
    scores = jax.nn.sigmoid(jnp.concatenate(sel_scores, axis=1))
    levels = jnp.concatenate(sel_levels, axis=1)

    boxes = clip_boxes(boxes, image_hw[0], image_hw[1])
    valid = small_box_mask(boxes, cfg.min_size) & (scores >= cfg.score_thresh)

    post_n = cfg.post_nms_top_n(training)
    keep_idx, keep_valid = class_nms_multi(boxes, scores, levels, valid, cfg.nms_thresh, post_n)
    proposals = jnp.take_along_axis(boxes, keep_idx[..., None], axis=1)
    prop_scores = jnp.take_along_axis(scores, keep_idx, axis=1)

    return {
        "boxes": jnp.where(keep_valid[..., None], proposals, 0.0),
        "scores": jnp.where(keep_valid, prop_scores, 0.0),
        "valid": keep_valid,
        "anchors": jnp.asarray(np.concatenate(anchors_np)),
        "objectness": obj,
        "pred_bbox_deltas": dlt,
    }


def assign_targets_to_anchors(anchors, gt_boxes, gt_valid, cfg: RPNConfig):
    """Per-anchor labels + matched-GT indices for the RPN loss
    (torchvision assign_targets_to_anchors).

    anchors: [N, 4]; gt_boxes: [B, G, 4]; gt_valid: [B, G].
    Returns labels [B, N] (1/0/-1) and matches [B, N] (clamped GT index).

    Regression-target encoding is deliberately NOT done here: torchvision
    encodes [B, N, 4] targets for every anchor, but the loss only reads the
    ~256 sampled rows — and a [B*N, 4] f32 tensor wastes 31/32 of every
    (8, 128) TPU tile on the 4-wide minor dim (~7 ms/step in the train
    profile). ``losses.rpn_loss`` gathers the sampled anchors first and
    encodes [B, S, 4].
    """

    def per_image(boxes, valid):
        iou = box_iou(boxes, anchors)  # [G, N]
        matches = match_proposals(iou, valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh, allow_low_quality=True)
        labels = jnp.where(matches >= 0, 1, jnp.where(matches == -1, 0, -1))
        # Background image: no valid gt -> all negatives (torchvision special case).
        labels = jnp.where(jnp.any(valid), labels, 0)
        return labels, jnp.clip(matches, 0)

    return jax.vmap(per_image)(gt_boxes, gt_valid)
