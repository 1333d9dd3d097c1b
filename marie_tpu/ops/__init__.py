"""TPU-native compute ops.

These are the XLA/Pallas equivalents of the reference's native kernel
inventory (detectron2 csrc, SURVEY.md §2.6): NMS (plain + rotated),
ROIAlign (plain + rotated), rotated box IoU, deformable convolution,
plus document-AI specific ops the reference does on CPU/OpenCV
(connected components, CTC decode).

All ops take **static shapes** — callers pad to fixed sizes and pass
validity masks; this is what keeps XLA from recompiling per page.
"""

from marie_tpu.ops.box_ops import (
    box_area,
    box_iou,
    boxes_cxcywh_to_xyxy,
    boxes_xywh_to_xyxy,
    boxes_xyxy_to_xywh,
)
from marie_tpu.ops.connected_components import (
    component_boxes,
    component_boxes_reduce,
    component_boxes_reduce2,
    component_boxes_runs,
    component_boxes_runs_cc,
    connected_components,
)
from marie_tpu.ops.ctc import ctc_greedy_decode
from marie_tpu.ops.deform_conv import deform_conv2d
from marie_tpu.ops.nms import nms, rotated_nms
from marie_tpu.ops.roi_align import roi_align, roi_align_rotated
from marie_tpu.ops.rotated_iou import pairwise_rotated_iou, rotated_iou

__all__ = [
    "box_area",
    "box_iou",
    "boxes_xywh_to_xyxy",
    "boxes_xyxy_to_xywh",
    "boxes_cxcywh_to_xyxy",
    "nms",
    "rotated_nms",
    "rotated_iou",
    "pairwise_rotated_iou",
    "roi_align",
    "roi_align_rotated",
    "connected_components",
    "component_boxes",
    "component_boxes_reduce",
    "component_boxes_reduce2",
    "component_boxes_runs",
    "component_boxes_runs_cc",
    "deform_conv2d",
    "ctc_greedy_decode",
]
