"""Independent numpy oracles for the detection ops.

torchvision is not in this image, so these re-state the well-specified
torchvision algorithms (greedy NMS, IoU matcher, box coder) in plain numpy as
a cross-check implementation, deliberately written in the naive
sequential/dynamic style so that agreement with the static-shape JAX versions
is meaningful.
"""

import math

import numpy as np


def iou_matrix(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS; returns kept indices in descending score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = iou_matrix(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True  # self
    return np.array(keep, dtype=np.int64)


def batched_greedy_nms(boxes, scores, classes, thresh):
    max_coord = boxes.max() if len(boxes) else 0.0
    offsets = classes.astype(boxes.dtype) * (max_coord + 1)
    return greedy_nms(boxes + offsets[:, None], scores, thresh)


def match_oracle(iou, high, low, allow_low_quality):
    """torchvision Matcher semantics: iou is [G, N]."""
    matched_vals = iou.max(axis=0)
    matches = iou.argmax(axis=0).astype(np.int64)
    all_matches = matches.copy()
    out = matches.copy()
    out[matched_vals < low] = -1
    out[(matched_vals >= low) & (matched_vals < high)] = -2
    if allow_low_quality:
        best_per_gt = iou.max(axis=1)
        for g in range(iou.shape[0]):
            if best_per_gt[g] <= 0:
                continue
            ties = np.nonzero(iou[g] == best_per_gt[g])[0]
            out[ties] = all_matches[ties]
    return out


BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def encode_oracle(reference, proposals, weights):
    wx, wy, ww, wh = weights
    ex_w = proposals[:, 2] - proposals[:, 0]
    ex_h = proposals[:, 3] - proposals[:, 1]
    ex_cx = proposals[:, 0] + 0.5 * ex_w
    ex_cy = proposals[:, 1] + 0.5 * ex_h
    gt_w = reference[:, 2] - reference[:, 0]
    gt_h = reference[:, 3] - reference[:, 1]
    gt_cx = reference[:, 0] + 0.5 * gt_w
    gt_cy = reference[:, 1] + 0.5 * gt_h
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def decode_oracle(deltas, proposals, weights):
    wx, wy, ww, wh = weights
    w = proposals[:, 2] - proposals[:, 0]
    h = proposals[:, 3] - proposals[:, 1]
    cx = proposals[:, 0] + 0.5 * w
    cy = proposals[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[:, 3] / wh, BBOX_XFORM_CLIP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1
    )
