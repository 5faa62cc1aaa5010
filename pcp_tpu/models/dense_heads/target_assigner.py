"""On-device CenterPoint target assignment.

Replaces the reference's per-GT CPU python loop
(/root/reference/pcdet/models/dense_heads/center_head.py:105-166 + 168-268)
with one vectorized gaussian splat per (batch, head): identical numerics —
coord computation with the same clamps and int truncation, CornerNet
gaussian radius clamped at MIN_RADIUS, per-object regression targets
[center - floor(center), z, log(dim), cos(yaw), sin(yaw), extras...].
"""
from functools import partial

import jax
import jax.numpy as jnp

from ..model_utils.centernet_utils import gaussian_radius, splat_gaussians


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "feat_w", "feat_h", "stride", "num_max_objs", "patch_radius", "code_size",
    ),
)
def assign_targets_single_head(
    gt_boxes, head_class_map, num_classes, feat_w, feat_h, stride,
    pc_range, voxel_size, gaussian_overlap, min_radius,
    num_max_objs=500, patch_radius=10, code_size=8, iou_target=None,
):
    """Single-sample, single-head target assignment.

    Args:
        gt_boxes: (M, >=8) [x y z dx dy dz yaw (extras...) cls]; cls is the
            1-based global class index, 0 for padding rows.
        head_class_map: (num_total_classes + 1,) int32 — global class index ->
            1-based local class index in this head, 0 if absent.
    Returns:
        heatmap (H, W, num_classes), target_boxes (num_max_objs, code_size),
        inds (num_max_objs,), mask (num_max_objs,).
    """
    m = gt_boxes.shape[0]
    assert m == num_max_objs, "pad gt_boxes to NUM_MAX_OBJS"
    cls_global = gt_boxes[:, -1].astype(jnp.int32)
    local_cls = head_class_map[jnp.clip(cls_global, 0, head_class_map.shape[0] - 1)]
    in_head = local_cls > 0

    x, y, z = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    dx, dy = gt_boxes[:, 3], gt_boxes[:, 4]

    coord_x = (x - pc_range[0]) / voxel_size[0] / stride
    coord_y = (y - pc_range[1]) / voxel_size[1] / stride
    coord_x = jnp.clip(coord_x, 0.0, feat_w - 0.5)
    coord_y = jnp.clip(coord_y, 0.0, feat_h - 0.5)
    center = jnp.stack([coord_x, coord_y], axis=-1)
    center_int = center.astype(jnp.int32)

    dxs = dx / voxel_size[0] / stride
    dys = dy / voxel_size[1] / stride
    radius = gaussian_radius(dxs, dys, min_overlap=gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    valid = in_head & (dx > 0) & (dy > 0)

    heatmap = splat_gaussians(
        center, radius, local_cls - 1, valid, num_classes, (feat_w, feat_h),
        patch_radius=patch_radius,
    )

    inds = jnp.where(valid, center_int[:, 1] * feat_w + center_int[:, 0], 0)
    mask = valid

    offs = center - center_int.astype(center.dtype)
    log_dim = jnp.log(jnp.clip(gt_boxes[:, 3:6], min=1e-6))
    parts = [offs, z[:, None], log_dim, jnp.cos(gt_boxes[:, 6:7]), jnp.sin(gt_boxes[:, 6:7])]
    extra = code_size - 8 - (1 if iou_target is not None else 0)
    if extra > 0:  # velocity columns, gt layout [7 : 7+extra]
        parts.append(gt_boxes[:, 7 : 7 + extra])
    if iou_target is not None:
        # predicted-IoU calibration target in the LAST reg channel
        # (reference center_head.py:163-164: ret_boxes[k, -1])
        parts.append(iou_target[:, None])
    target_boxes = jnp.concatenate(parts, axis=-1)
    target_boxes = jnp.where(valid[:, None], target_boxes, 0.0)
    return heatmap, target_boxes, inds.astype(jnp.int32), mask
