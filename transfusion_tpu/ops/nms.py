"""Static-shape exact NMS for TPU.

Replaces ``torchvision.ops.batched_nms`` (used by RPN proposal filtering and
RoI postprocessing, ``modeling/obj_detection/roi_wrappers.py:477``) with a
TPU-friendly algorithm that keeps every shape static:

1. sort candidates by score (descending, stable) per image;
2. walk score-sorted *blocks* with a single scalar block counter shared by
   the whole image batch (no per-image loop state -> no batched gathers);
   each block is suppressed against previously kept boxes with one masked
   IoU sweep, then within-block dependencies are resolved by Jacobi
   iteration of the strictly-lower-triangular suppression recurrence (a
   DAG, so the iteration converges to the unique exact greedy solution);
3. early-exit the block loop once every image has ``max_keep`` boxes kept —
   greedy NMS keeps are a prefix property of the score ordering, so
   stopping early (or running extra blocks for an already-done image) is
   exact, and in practice only a couple of blocks ever run.

This turns the O(N) sequential greedy loop into a handful of batched VPU
sweeps — the thing a naive port of the CUDA kernel would never do.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -jnp.inf


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between [B, M, 4] and [B, N, 4] -> [B, M, N]."""
    lt = jnp.maximum(a[:, :, None, :2], b[:, None, :, :2])
    rb = jnp.minimum(a[:, :, None, 2:], b[:, None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a[:, :, None] + area_b[:, None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _resolve_block(overlap: jnp.ndarray, alive0: jnp.ndarray) -> jnp.ndarray:
    """Exact within-block greedy suppression, batched.

    ``overlap[b, i, j]`` is True when candidate j (higher score, j < i)
    overlaps candidate i above threshold. The greedy recurrence
    ``alive[i] = alive0[i] & ~any_j(overlap[i, j] & alive[j])`` references
    only j < i, so Jacobi iteration converges to its unique fixpoint in at
    most chain-depth steps.
    """
    block = overlap.shape[-1]

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < block)

    def body(state):
        alive, _, it = state
        new = alive0 & ~jnp.any(overlap & alive[:, None, :], axis=-1)
        return new, alive, it + 1

    alive, _, _ = lax.while_loop(cond, body, (alive0, jnp.zeros_like(alive0), 0))
    return alive


@partial(jax.jit, static_argnames=("max_keep", "block_size"))
def nms_multi(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    block_size: int = 256,
):
    """Exact greedy NMS over a batch of images.

    Args:
      boxes: [B, N, 4]; scores: [B, N]; valid: [B, N] bool (padding False).
    Returns:
      keep_idx: [B, max_keep] int32 indices into the input order, descending
        score (equals the greedy keep list truncated to max_keep).
      keep_valid: [B, max_keep] bool — False rows are padding (index 0).
    """
    bsz, n = scores.shape
    scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-scores, axis=-1, stable=True)

    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)

    pad = (-n) % block_size
    if pad:
        sboxes = jnp.pad(sboxes, ((0, 0), (0, pad), (0, 0)))
        svalid = jnp.pad(svalid, ((0, 0), (0, pad)), constant_values=False)
    n_pad = n + pad
    num_blocks = n_pad // block_size
    idx = jnp.arange(n_pad)
    blk_arange = jnp.arange(block_size)

    def cond(state):
        _, kept_count, b = state
        return (b < num_blocks) & jnp.any(kept_count < max_keep)

    def body(state):
        keep, kept_count, b = state
        s = b * block_size
        blk_boxes = lax.dynamic_slice(sboxes, (0, s, 0), (bsz, block_size, 4))
        blk_valid = lax.dynamic_slice(svalid, (0, s), (bsz, block_size))

        iou_all = _pairwise_iou(blk_boxes, sboxes)  # [B, blk, n_pad]
        prior_kept = keep & (idx < s)[None, :]
        suppressed = jnp.any((iou_all > iou_thresh) & prior_kept[:, None, :], axis=-1)

        iou_blk = lax.dynamic_slice(iou_all, (0, 0, s), (bsz, block_size, block_size))
        overlap = (iou_blk > iou_thresh) & (blk_arange[None, :] < blk_arange[:, None])[None]
        alive = _resolve_block(overlap, blk_valid & ~suppressed)

        keep = lax.dynamic_update_slice(keep, alive, (0, s))
        return keep, kept_count + jnp.sum(alive, axis=-1), b + 1

    keep0 = jnp.zeros((bsz, n_pad), dtype=bool)
    counts0 = jnp.zeros((bsz,), dtype=jnp.int32)
    keep, _, _ = lax.while_loop(cond, body, (keep0, counts0, jnp.array(0)))

    # First max_keep kept positions per image, already in score order.
    pos = jnp.argsort(jnp.where(keep, idx[None], n_pad + idx[None]), axis=-1, stable=True)
    pos = pos[:, :max_keep]
    keep_valid = jnp.take_along_axis(keep, pos, axis=1)
    orig = jnp.take_along_axis(order, jnp.minimum(pos, n - 1), axis=1)
    keep_idx = jnp.where(keep_valid, orig, 0)
    return keep_idx.astype(jnp.int32), keep_valid


def class_nms_multi(boxes, scores, classes, valid, iou_thresh, max_keep, block_size=256):
    """Batched per-class NMS via the coordinate-offset trick.

    ``classes`` [B, N] may encode noun classes (RoI postprocess) or FPN level
    ids (RPN proposal filtering) — anything that partitions suppression.
    """
    masked = jnp.where(valid[..., None], boxes, 0.0)
    max_coord = jnp.max(masked, axis=(1, 2), keepdims=True)
    offsets = classes.astype(boxes.dtype)[..., None] * (max_coord + 1.0)
    return nms_multi(boxes + offsets, scores, valid, iou_thresh, max_keep, block_size)


def nms(boxes, scores, valid, iou_thresh, max_keep, block_size=256):
    """Single-image convenience wrapper around nms_multi."""
    idx, keep_valid = nms_multi(
        boxes[None], scores[None], valid[None], iou_thresh, max_keep, block_size
    )
    return idx[0], keep_valid[0]


def batched_nms(boxes, scores, classes, valid, iou_thresh, max_keep, block_size=256):
    """Single-image per-class NMS (torchvision batched_nms semantics)."""
    idx, keep_valid = class_nms_multi(
        boxes[None], scores[None], classes[None], valid[None], iou_thresh, max_keep, block_size
    )
    return idx[0], keep_valid[0]
