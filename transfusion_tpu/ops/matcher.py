"""Proposal-to-GT matching and balanced sampling, static-shape.

Semantics follow torchvision's ``Matcher`` and
``BalancedPositiveNegativeSampler`` which the reference RoI/RPN training
depends on (``modeling/obj_detection/roi_wrappers.py:349-396`` routes through
``proposal_matcher``; the sampler counts come from ``rcnn_kwargs``:
``rpn_batch_size_per_image: 64``, ``box_batch_size_per_image: 128``).

Dynamic index lists become fixed-size masks: ``match_proposals`` returns a
per-proposal matched GT index plus the two sentinel codes, and
``balanced_sample`` returns a boolean mask with exactly
``min(num_pos, batch*frac)`` positives and up to ``batch - num_pos``
negatives, chosen by random ranking (equivalent in distribution to
torchvision's randperm selection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_thresh: float,
    low_thresh: float,
    allow_low_quality: bool = False,
) -> jnp.ndarray:
    """Match each proposal to a GT box by max IoU.

    Args:
      iou: [G, N] IoU of gt x proposals; gt_valid: [G] bool.
    Returns:
      matches: [N] int32 — GT index, or BELOW_LOW_THRESHOLD / BETWEEN_THRESHOLDS.
    """
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(iou, axis=0)
    matches = jnp.argmax(iou, axis=0).astype(jnp.int32)

    below = matched_vals < low_thresh
    between = (matched_vals >= low_thresh) & (matched_vals < high_thresh)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality:
        # For each GT, every prediction tied for that GT's best IoU keeps its
        # argmax match (torchvision set_low_quality_matches_).
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
        restore = jnp.any(is_best, axis=0)
        out = jnp.where(restore, matches, out)

    return out


def balanced_sample(
    key: jax.Array,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
):
    """Sample positives/negatives with fixed budget.

    Args:
      labels: [N] int — >0 positive, 0 negative, <0 ignored.
      valid: [N] bool — padded rows False.
    Returns:
      (pos_mask, neg_mask): bool [N] each.
    """
    is_pos = (labels >= 1) & valid
    is_neg = (labels == 0) & valid

    num_pos_target = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), num_pos_target)
    num_neg = jnp.minimum(jnp.sum(is_neg), batch_size - num_pos)

    kp, kn = jax.random.split(key)
    n = labels.shape[0]

    def rank_within(mask, k):
        r = jax.random.uniform(k, (n,))
        keys = jnp.where(mask, r, jnp.inf)
        return jnp.argsort(jnp.argsort(keys))

    pos_mask = is_pos & (rank_within(is_pos, kp) < num_pos)
    neg_mask = is_neg & (rank_within(is_neg, kn) < num_neg)
    return pos_mask, neg_mask
