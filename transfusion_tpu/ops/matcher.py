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
    n = labels.shape[0]
    pos_take, idx_p, neg_take, idx_n = _sample_parts(key, labels, valid, batch_size, positive_fraction)
    pos_mask = jnp.zeros((n,), bool).at[idx_p].set(pos_take, mode="drop")
    neg_mask = jnp.zeros((n,), bool).at[idx_n].set(neg_take, mode="drop")
    return pos_mask, neg_mask


def _sample_parts(key, labels, valid, batch_size: int, positive_fraction: float):
    """Shared core: random positive/negative index selection WITHOUT a full
    sort. A rank over 196k RPN anchors via double argsort costs four
    [B, 196k] device sorts per step (~13 ms in the train profile);
    ``approx_max_k`` over random keys lowers to the TPU PartialReduce op and
    picks a uniformly-random subset in distribution (any exact-k selection on
    iid uniform keys is exchangeable over indices). ``recall_target=1.0``
    keeps the selected COUNTS exact."""
    is_pos = (labels >= 1) & valid
    is_neg = (labels == 0) & valid

    num_pos_target = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), num_pos_target)
    num_neg = jnp.minimum(jnp.sum(is_neg), batch_size - num_pos)

    kp, kn = jax.random.split(key)
    n = labels.shape[0]

    def pick(mask, k, kmax, count):
        r = jax.random.uniform(k, (n,))
        keys = jnp.where(mask, r, -1.0)
        kk = min(kmax, n)
        vals, idx = jax.lax.approx_max_k(keys, kk, recall_target=1.0)
        take = (jnp.arange(kk) < count) & (vals >= 0.0)
        return take, idx

    pos_take, idx_p = pick(is_pos, kp, num_pos_target, num_pos)
    neg_take, idx_n = pick(is_neg, kn, batch_size, num_neg)
    return pos_take, idx_p, neg_take, idx_n


def balanced_sample_idx(
    key: jax.Array,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
):
    """Index-form sampler: returns ``(idx, sampled_valid)`` with shape
    [batch_size] each — positives first, then negatives, padding rows False.

    Lets the caller GATHER the sampled rows and compute targets/losses on
    [batch_size] rows instead of masking dense per-anchor tensors (the RPN
    path's [B, A, 4] encode suffers a 32x tile-packing waste on TPU for the
    4-wide minor dim)."""
    pos_take, idx_p, neg_take, idx_n = _sample_parts(key, labels, valid, batch_size, positive_fraction)
    num_pos = jnp.sum(pos_take)
    npt, bs = idx_p.shape[0], batch_size
    j = jnp.arange(bs)
    from_pos = j < num_pos
    pos_src = jnp.clip(j, 0, npt - 1)
    neg_src = jnp.clip(j - num_pos, 0, idx_n.shape[0] - 1)
    idx = jnp.where(from_pos, idx_p[pos_src], idx_n[neg_src])
    sampled_valid = from_pos | ((j - num_pos) < jnp.sum(neg_take))
    return idx, sampled_valid
