"""Anchor generation with torchvision semantics, computed at trace time.

The reference uses torchvision's ``AnchorGenerator`` defaults for the 5-level
FPN (sizes 32..512, aspect ratios 0.5/1/2 — see
``modeling/obj_detection/mobilenet_fpn_utils.py:241-249``: a custom generator
is only built when fewer FPN levels are returned). Feature shapes are static
under jit, so the full anchor array is a compile-time constant folded by XLA.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def cell_anchors(size: float, aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered base anchors, rounded like torchvision."""
    out = []
    for a in aspect_ratios:
        h = size * math.sqrt(a)
        w = size / math.sqrt(a)
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.round(np.asarray(out, dtype=np.float32))


def grid_anchors(
    feature_shapes: Sequence[tuple[int, int]],
    image_size: tuple[int, int],
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> list[np.ndarray]:
    """Per-level anchor arrays [H*W*A, 4] in image coordinates.

    Strides derive from image_size // feature_size (torchvision computes them
    the same way at call time rather than trusting nominal strides).
    """
    assert len(feature_shapes) == len(sizes), "one size group per level"
    ih, iw = image_size
    out = []
    for (fh, fw), size in zip(feature_shapes, sizes):
        stride_h, stride_w = ih // fh, iw // fw
        base = cell_anchors(size, aspect_ratios)  # [A, 4]
        shift_x = np.arange(fw, dtype=np.float32) * stride_w
        shift_y = np.arange(fh, dtype=np.float32) * stride_h
        sx, sy = np.meshgrid(shift_x, shift_y)  # [fh, fw]
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)  # order: H, W, A
        out.append(anchors.astype(np.float32))
    return out
