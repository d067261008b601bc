from transfusion_tpu.ops.boxes import (
    BoxCoder,
    box_area,
    box_iou,
    clip_boxes,
    small_box_mask,
)
from transfusion_tpu.ops.nms import batched_nms, nms
from transfusion_tpu.ops.matcher import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    balanced_sample,
    balanced_sample_idx,
    match_proposals,
)

__all__ = [
    "BoxCoder",
    "box_area",
    "box_iou",
    "clip_boxes",
    "small_box_mask",
    "nms",
    "batched_nms",
    "match_proposals",
    "balanced_sample",
    "balanced_sample_idx",
    "BELOW_LOW_THRESHOLD",
    "BETWEEN_THRESHOLDS",
]
