from .rotated_iou import (
    box_corners_bev,
    boxes_iou_bev,
    boxes_iou3d,
    boxes_iou_normal,
    boxes_overlap_bev,
)
from .nms import nms_bev, nms_bev_mask, class_agnostic_nms, multi_classes_nms
from .points_in_boxes import points_in_boxes, points_in_boxes_mask, points_in_boxes_batch
from . import pillars
