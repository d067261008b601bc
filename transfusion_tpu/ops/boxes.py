"""Box primitives with torchvision-compatible semantics, as pure JAX.

The reference leans on ``torchvision.ops.boxes`` (box_iou, clip_boxes_to_image,
remove_small_boxes — used at ``modeling/obj_detection/roi_wrappers.py:369,442,469``)
and on torchvision's ``BoxCoder`` for RPN/RoI regression targets. These are the
numerical contracts every downstream stage (NMS ordering, mAP matching,
prediction JSON) depends on, so they are reproduced here exactly — but over
batched fixed-shape arrays with validity masks instead of per-image tensors.

All boxes are ``[x1, y1, x2, y2]`` in pixels, arrays of shape ``[..., 4]``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area without the legacy ``+1`` (torchvision convention)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: [..., N, 4], b: [..., M, 4] -> [..., N, M]."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clamp boxes into ``[0, w] x [0, h]`` (torchvision clip_boxes_to_image).

    ``height``/``width`` may be scalars or arrays broadcastable against the
    leading box dims (per-image sizes in a batch).
    """
    height = jnp.asarray(height, boxes.dtype)
    width = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True where a box has both sides >= min_size (remove_small_boxes keep set)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


# torchvision BoxCoder clamps dw/dh at log(1000/16) before exp.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


class BoxCoder(NamedTuple):
    """Delta <-> box transform with torchvision weighting.

    RPN uses weights (1,1,1,1); the RoI box head uses (10,10,5,5) — the
    torchvision FasterRCNN defaults the reference inherits.
    """

    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)

    def encode(self, reference: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
        """Regression targets for ``reference`` (gt) boxes w.r.t. proposals."""
        wx, wy, ww, wh = self.weights
        ex_w = proposals[..., 2] - proposals[..., 0]
        ex_h = proposals[..., 3] - proposals[..., 1]
        ex_cx = proposals[..., 0] + 0.5 * ex_w
        ex_cy = proposals[..., 1] + 0.5 * ex_h

        gt_w = reference[..., 2] - reference[..., 0]
        gt_h = reference[..., 3] - reference[..., 1]
        gt_cx = reference[..., 0] + 0.5 * gt_w
        gt_cy = reference[..., 1] + 0.5 * gt_h

        # Guard padded/degenerate proposals; callers mask these rows out.
        safe_w = jnp.where(ex_w > 0, ex_w, 1.0)
        safe_h = jnp.where(ex_h > 0, ex_h, 1.0)
        safe_gt_w = jnp.where(gt_w > 0, gt_w, 1.0)
        safe_gt_h = jnp.where(gt_h > 0, gt_h, 1.0)

        dx = wx * (gt_cx - ex_cx) / safe_w
        dy = wy * (gt_cy - ex_cy) / safe_h
        dw = ww * jnp.log(safe_gt_w / safe_w)
        dh = wh * jnp.log(safe_gt_h / safe_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def decode(self, deltas: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
        """Apply deltas [..., 4] (or [..., C, 4]) to proposals [..., 4]."""
        wx, wy, ww, wh = self.weights
        if deltas.ndim == proposals.ndim + 1:
            proposals = proposals[..., None, :]
        w = proposals[..., 2] - proposals[..., 0]
        h = proposals[..., 3] - proposals[..., 1]
        cx = proposals[..., 0] + 0.5 * w
        cy = proposals[..., 1] + 0.5 * h

        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
        dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

        pred_cx = dx * w + cx
        pred_cy = dy * h + cy
        pred_w = jnp.exp(dw) * w
        pred_h = jnp.exp(dh) * h

        return jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )
