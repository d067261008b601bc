"""Naive numpy RoIAlign (aligned=True) oracle — direct loop translation of
the published detectron2/torchvision bilinear math."""

import numpy as np


def bilinear(feat, y, x):
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1 - ly, 1 - lx
    return (
        feat[y0, x0] * hy * hx
        + feat[y0, x1] * hy * lx
        + feat[y1, x0] * ly * hx
        + feat[y1, x1] * ly * lx
    )


def roi_align_oracle(feat, rois, scale, pooled=7, ratio=0):
    """ratio=0 selects detectron2's adaptive ceil(bin_size) grid per RoI per
    axis, with count = max(grid_h * grid_w, 1) (torchvision roi_align CUDA)."""
    out = np.zeros((len(rois), pooled, pooled, feat.shape[-1]), np.float32)
    for ri, roi in enumerate(rois):
        x1 = roi[0] * scale - 0.5
        y1 = roi[1] * scale - 0.5
        x2 = roi[2] * scale - 0.5
        y2 = roi[3] * scale - 0.5
        bw = (x2 - x1) / pooled
        bh = (y2 - y1) / pooled
        gy = ratio if ratio > 0 else int(np.ceil(bh))
        gx = ratio if ratio > 0 else int(np.ceil(bw))
        count = max(gy * gx, 1)
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(feat.shape[-1], np.float32)
                for iy in range(gy):
                    for ix in range(gx):
                        y = y1 + (py + (iy + 0.5) / gy) * bh
                        x = x1 + (px + (ix + 0.5) / gx) * bw
                        acc += bilinear(feat, y, x)
                out[ri, py, px] = acc / count
    return out
