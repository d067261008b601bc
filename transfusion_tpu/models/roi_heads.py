"""RoI heads: triple-label target assignment, TwoMLP box head, noun/verb/box/
TTC predictors, and static-shape detection postprocessing.

Behavioral source: ``modeling/obj_detection/roi_wrappers.py`` —
  * losses live OUTSIDE the model (the trainer), so the forward returns raw
    logits plus sampled labels/targets (``roi_wrappers.py:233-242``);
  * triple-label assignment gives each sampled proposal a noun, verb and ttc;
    background rows get noun 0 / verb 999 / ttc 999.0 and between-threshold
    rows -1 (``roi_wrappers.py:349-396``);
  * inference postprocess: per-class box decode, score threshold, small-box
    removal, per-class NMS, top-k, then "additional postprocessing" — verb
    replacement by train noun->verb frequency argmax for unseen pairs and
    greedy suppression of intersecting same-(noun,verb) detections via the
    lower-triangular conflict matrix (``roi_wrappers.py:398-535``).

Everything is fixed-shape: sampled proposals occupy ``batch_size_per_image``
slots with -1-labeled padding; detections occupy ``detections_per_img`` slots
with a validity mask.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.ops import (
    BoxCoder,
    balanced_sample_idx,
    box_iou,
    clip_boxes,
    match_proposals,
    small_box_mask,
)
from transfusion_tpu.ops.nms import class_nms_multi

IGNORE_VERB_IDX_BG = 999  # roi_wrappers.py:21


@dataclass(frozen=True)
class RoIConfig:
    num_nouns: int = 88
    num_verbs: int = 75
    representation_size: int = 1024
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 128
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    min_size: float = 1e-2
    box_1_dropout: float = 0.0
    box_2_dropout: float = 0.0
    classif_dropout: float = 0.0
    ttc_on: bool = False
    # Transformer TTC head second pass (ttc_hand_head.use): the per-RoI ttc
    # output is a -1 placeholder (roi_wrappers.py:219-226) and real TTCs are
    # produced over the postprocessed detections.
    ttc_hand: bool = False
    additional_postprocessing: bool = False
    min_ttc: float = 0.251  # faster_rcnn_wrapper.py:20
    # Pre-NMS candidate cap over the (proposal x class) explosion. Greedy-NMS
    # keeps are a prefix property of the score ordering, so running NMS on the
    # top-T candidates by score is EXACT whenever either (a) at most T
    # candidates clear score_thresh (the overwhelmingly common case at 0.05),
    # or (b) detections_per_img keeps occur within the top T. Without the cap
    # the masked static-shape NMS sweeps all proposals*classes (87k/image at
    # flagship settings: ~25 ms/step of gathers + IoU sweeps for candidates
    # that torchvision's dynamic-shape path would have score-filtered away).
    # 0 disables the cap.
    pre_nms_candidates: int = 4096


BOX_CODER = BoxCoder((10.0, 10.0, 5.0, 5.0))


class BoxHead(nn.Module):
    """torchvision TwoMLPHead: flatten -> fc6 -> relu -> fc7 -> relu."""

    representation_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, r = x.shape[:2]
        h = x.reshape(b, r, -1)
        h = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc6")(h))
        h = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype, name="fc7")(h))
        return h


class RoIPredictors(nn.Module):
    """box_regressor / noun_classifier / verb_classifier / ttc head.

    Heads are initialized normal(0.01) with zero bias like the reference
    re-initialization path (roi_wrappers.py:92-126).
    """

    cfg: RoIConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, box_features, deterministic: bool = True):
        cfg = self.cfg
        init = nn.initializers.normal(0.01)

        h = nn.Dropout(cfg.box_2_dropout, deterministic=deterministic)(box_features)
        box_regression = nn.Dense(4 * cfg.num_nouns, kernel_init=init, dtype=self.dtype, name="box_regressor")(h)

        h = nn.Dropout(cfg.classif_dropout, deterministic=deterministic)(box_features)
        class_logits = nn.Dense(cfg.num_nouns, kernel_init=init, dtype=self.dtype, name="noun_classifier")(h)
        verb_logits = nn.Dense(cfg.num_verbs, kernel_init=init, dtype=self.dtype, name="verb_classifier")(h)

        if cfg.ttc_on and cfg.ttc_hand:
            # Transformer head: no linear layer exists; per-RoI slot carries
            # the -1 placeholder (roi_wrappers.py:219-226) until the
            # detection second pass fills it.
            ttcs = -jnp.ones_like(class_logits[..., 0])
        elif cfg.ttc_on:
            ttc_prelim = nn.Dense(1, dtype=self.dtype, name="ttc_pred_layer")(h)
            ttcs = jax.nn.softplus(ttc_prelim)[..., 0]
        else:
            ttcs = None

        return {
            "class_logits": class_logits,
            "verb_logits": verb_logits,
            "box_regression": box_regression,
            "ttcs": ttcs,
            "box_features": h,
        }


def select_training_samples(key, proposals, prop_valid, targets, cfg: RoIConfig):
    """Sample a fixed set of training RoIs with triple labels.

    proposals: [B, P, 4] + prop_valid [B, P]; targets: dict with boxes
    [B, G, 4], nouns/verbs [B, G], ttcs [B, G], valid [B, G].
    Returns dict of [B, S, ...] arrays, S = batch_size_per_image; padding rows
    carry noun/verb label -1 and valid False.
    """
    s = cfg.batch_size_per_image

    def per_image(k, props, pvalid, boxes, nouns, verbs, ttcs, gvalid):
        # Append gt boxes as proposals (roi_wrappers.py:322-323).
        all_props = jnp.concatenate([props, boxes], axis=0)
        all_valid = jnp.concatenate([pvalid, gvalid], axis=0)

        iou = box_iou(boxes, all_props)
        iou = jnp.where(all_valid[None, :], iou, -1.0)
        matches = match_proposals(iou, gvalid, cfg.fg_iou_thresh, cfg.bg_iou_thresh, False)
        clamped = jnp.clip(matches, 0)

        noun_l = jnp.where(matches >= 0, nouns[clamped], jnp.where(matches == -1, 0, -1))
        verb_l = jnp.where(matches >= 0, verbs[clamped], jnp.where(matches == -1, IGNORE_VERB_IDX_BG, -1))
        ttc_l = jnp.where(
            matches >= 0, ttcs[clamped], jnp.where(matches == -1, float(IGNORE_VERB_IDX_BG), -1.0)
        )
        # Background image: everything negative (torchvision special case).
        has_gt = jnp.any(gvalid)
        noun_l = jnp.where(has_gt, noun_l, 0)
        verb_l = jnp.where(has_gt, verb_l, IGNORE_VERB_IDX_BG)
        ttc_l = jnp.where(has_gt, ttc_l, float(IGNORE_VERB_IDX_BG))
        noun_l = jnp.where(all_valid, noun_l, -1)

        # Index-form sampling: gathers the s sampled rows directly (positives
        # first) instead of mask + stable-argsort compaction over all
        # proposals (saves two [P] sorts per image).
        order, sampled_valid = balanced_sample_idx(k, noun_l, all_valid, s, cfg.positive_fraction)

        rois = all_props[order]
        matched_gt = boxes[clamped[order]]
        reg_targets = BOX_CODER.encode(matched_gt, rois)

        def mask_label(x, fill):
            return jnp.where(sampled_valid, x[order], fill)

        return {
            "rois": jnp.where(sampled_valid[:, None], rois, 0.0),
            "nouns": mask_label(noun_l, -1),
            "verbs": mask_label(verb_l, -1),
            "ttcs": mask_label(ttc_l, -1.0),
            "reg_targets": jnp.where(sampled_valid[:, None], reg_targets, 0.0),
            "valid": sampled_valid,
        }

    keys = jax.random.split(key, proposals.shape[0])
    return jax.vmap(per_image)(
        keys, proposals, prop_valid,
        targets["boxes"], targets["nouns"], targets["verbs"], targets["ttcs"], targets["valid"],
    )


def postprocess_detections(
    outputs: dict,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_hw: tuple,
    cfg: RoIConfig,
    noun_verb_frequencies: jnp.ndarray | None = None,
    training: bool = False,
):
    """Static-shape translation of DualClassRoiHeadsWrapper.postprocess_detections.

    Returns dict of [B, K, ...] (K = detections_per_img): boxes (image-resized
    coordinates — callers rescale to original size), scores, nouns, verbs,
    ttcs, prop_idx, valid.
    """
    # Postprocess runs in f32 regardless of the model compute dtype: bf16 box
    # coordinates at 1024-px scale lose whole pixels.
    f32 = lambda x: None if x is None else x.astype(jnp.float32)
    class_logits = f32(outputs["class_logits"])
    verb_logits = f32(outputs["verb_logits"])
    box_regression = f32(outputs["box_regression"])
    ttcs = f32(outputs["ttcs"])
    proposals = f32(proposals)
    bsz, r, c = class_logits.shape

    pred_boxes = BOX_CODER.decode(box_regression.reshape(bsz, r, c, 4), proposals)
    pred_boxes = clip_boxes(pred_boxes, image_hw[0], image_hw[1])
    scores = jax.nn.softmax(class_logits, axis=-1)
    # Per-proposal verb: argmax excluding the trailing bg verb (roi_wrappers.py:420).
    verb_idx = jnp.argmax(verb_logits[..., :-1], axis=-1)
    if ttcs is None:
        ttcs = jnp.zeros((bsz, r))

    # Explode to (proposal, class) candidates, dropping the bg column 0.
    cand_boxes = pred_boxes[:, :, 1:, :].reshape(bsz, r * (c - 1), 4)
    cand_scores = scores[:, :, 1:].reshape(bsz, r * (c - 1))
    cand_labels = jnp.broadcast_to(jnp.arange(1, c)[None, None, :], (bsz, r, c - 1)).reshape(bsz, -1)
    cand_prop = jnp.broadcast_to(jnp.arange(r)[None, :, None], (bsz, r, c - 1)).reshape(bsz, -1)

    # prop_valid is constant along the class axis: expand without a gather
    # (take_along_axis over the exploded axis lowers to a flat [B*R*C] gather
    # costing ~7 ms/step at flagship shapes).
    valid = (
        jnp.broadcast_to(prop_valid[:, :, None], (bsz, r, c - 1)).reshape(bsz, -1)
        & (cand_scores > cfg.score_thresh)
        & small_box_mask(cand_boxes, cfg.min_size)
    )

    t = cfg.pre_nms_candidates
    # Exactness diagnostic: how many above-threshold candidates the cap
    # dropped. The capped NMS is exact unless BOTH (a) pre_nms_missed > 0 and
    # (b) the keep cap stays unfilled (see RoIConfig.pre_nms_candidates);
    # callers (trainer.evaluate) log when that regime is entered, and the
    # deviation is bounded by pre_nms_missed extra detections (all scored
    # below every kept one).
    pre_nms_missed = jnp.zeros((bsz,), jnp.int32)
    if t and t < cand_scores.shape[1]:
        pre_nms_missed = jnp.maximum(valid.sum(axis=1).astype(jnp.int32) - t, 0)
        # Top-T by score before NMS (see RoIConfig.pre_nms_candidates for the
        # exactness argument). top_k's descending order also feeds NMS an
        # already-sorted list.
        top_scores, top_idx = jax.lax.top_k(
            jnp.where(valid, cand_scores, -jnp.inf), t
        )
        cand_boxes = jnp.take_along_axis(cand_boxes, top_idx[..., None], axis=1)
        cand_scores = jnp.where(jnp.isfinite(top_scores), top_scores, 0.0)
        cand_labels = jnp.take_along_axis(cand_labels, top_idx, axis=1)
        cand_prop = jnp.take_along_axis(cand_prop, top_idx, axis=1)
        valid = jnp.isfinite(top_scores)

    k = cfg.detections_per_img
    keep_idx, keep_valid = class_nms_multi(
        cand_boxes, cand_scores, cand_labels, valid, cfg.nms_thresh, k
    )

    def take(x):
        return jnp.take_along_axis(x, keep_idx, axis=1)

    det_boxes = jnp.take_along_axis(cand_boxes, keep_idx[..., None], axis=1)
    det_scores = take(cand_scores)
    det_nouns = take(cand_labels)
    det_prop = take(cand_prop)
    det_verbs = jnp.take_along_axis(verb_idx, det_prop, axis=1)
    det_ttcs = jnp.take_along_axis(ttcs, det_prop, axis=1)

    if cfg.additional_postprocessing and noun_verb_frequencies is not None:
        freqs = noun_verb_frequencies  # [num_nouns, num_verbs]
        det_freq_row = freqs[det_nouns]  # [B, K, V]
        argmax_verbs = jnp.argmax(det_freq_row, axis=-1)
        argmax_freq = jnp.take_along_axis(det_freq_row, argmax_verbs[..., None], axis=-1)[..., 0]
        cur_freq = jnp.take_along_axis(det_freq_row, det_verbs[..., None], axis=-1)[..., 0]
        replace = (cur_freq == 0) & (argmax_freq > 0)
        det_verbs = jnp.where(replace, argmax_verbs, det_verbs)

        # Greedy suppression of intersecting same-(noun,verb) detections
        # (roi_wrappers.py:498-521): detection i dies if any earlier kept-order
        # detection conflicts with it.
        xl = jnp.maximum(det_boxes[:, :, None, 0], det_boxes[:, None, :, 0])
        yt = jnp.maximum(det_boxes[:, :, None, 1], det_boxes[:, None, :, 1])
        xr = jnp.minimum(det_boxes[:, :, None, 2], det_boxes[:, None, :, 2])
        yb = jnp.minimum(det_boxes[:, :, None, 3], det_boxes[:, None, :, 3])
        intersect = (xl < xr) & (yt < yb)
        same = (det_nouns[:, :, None] == det_nouns[:, None, :]) & (
            det_verbs[:, :, None] == det_verbs[:, None, :]
        )
        both_valid = keep_valid[:, :, None] & keep_valid[:, None, :]
        eye = jnp.eye(k, dtype=bool)[None]
        conflicts = intersect & same & both_valid & ~eye
        lower = jnp.tril(jnp.ones((k, k), dtype=bool))[None]
        keep2 = jnp.sum(conflicts & lower, axis=-1) == 0
        keep_valid = keep_valid & keep2

        if not training and not cfg.ttc_hand:
            # With the transformer head the MIN_TTC clamp happens in its
            # second pass instead (faster_rcnn_wrapper.py:253-257).
            det_ttcs = jnp.maximum(det_ttcs, cfg.min_ttc)

    return {
        "boxes": jnp.where(keep_valid[..., None], det_boxes, 0.0),
        "scores": jnp.where(keep_valid, det_scores, 0.0),
        "nouns": jnp.where(keep_valid, det_nouns, 0),
        "verbs": jnp.where(keep_valid, det_verbs, 0),
        "ttcs": jnp.where(keep_valid, det_ttcs, 0.0),
        "prop_idx": det_prop,
        "valid": keep_valid,
        # Per-image count of above-threshold candidates the pre-NMS cap
        # dropped (0 = exactness precondition (a) holds; see above).
        "pre_nms_missed": pre_nms_missed,
    }
