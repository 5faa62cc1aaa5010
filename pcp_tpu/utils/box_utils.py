"""Host-side (numpy) box math.

Covers the subset of the reference's /root/reference/pcdet/utils/box_utils.py
used by the V2X pipeline: 3D corner computation, range masks, and limit-period
heading normalization.
"""
import numpy as np


def limit_period(val, offset=0.5, period=np.pi * 2):
    return val - np.floor(val / period + offset) * period


def boxes_to_corners_3d(boxes):
    """(N, 7) -> (N, 8, 3) corners.

    Corner order: bottom face (x+y+, x-y+, x-y-, x+y-) then top face, matching
    the pcdet template convention.
    """
    boxes = np.asarray(boxes)
    corners_norm = np.array(
        [
            [1, 1, -1], [-1, 1, -1], [-1, -1, -1], [1, -1, -1],
            [1, 1, 1], [-1, 1, 1], [-1, -1, 1], [1, -1, 1],
        ],
        dtype=boxes.dtype,
    ) / 2.0
    corners = boxes[:, None, 3:6] * corners_norm[None]  # (N, 8, 3)
    yaw = boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    rot = np.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(-1, 3, 3)
    corners = np.einsum("nij,nkj->nki", rot, corners)
    return corners + boxes[:, None, 0:3]


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1):
    """True for boxes with >= min_num_corners corners inside limit_range
    (reference box_utils.mask_boxes_outside_range_numpy semantics)."""
    if boxes.shape[0] == 0:
        return np.zeros((0,), dtype=bool)
    corners = boxes_to_corners_3d(boxes[:, :7])  # (N, 8, 3)
    inside = ((corners >= np.asarray(limit_range[0:3])) & (corners <= np.asarray(limit_range[3:6]))).all(axis=2)
    return inside.sum(axis=1) >= min_num_corners


def mask_points_by_range(points, limit_range):
    return (
        (points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4])
    )


def remove_points_in_boxes(points, boxes):
    """Drop points inside any of the given boxes (host; used by gt sampling)."""
    from .geometry import rot_z  # local import to avoid cycles

    keep = np.ones(points.shape[0], dtype=bool)
    for b in boxes:
        rel = points[:, :3] - b[:3]
        c, s = np.cos(b[6]), np.sin(b[6])
        lx = c * rel[:, 0] + s * rel[:, 1]
        ly = -s * rel[:, 0] + c * rel[:, 1]
        inside = (
            (np.abs(lx) < b[3] / 2) & (np.abs(ly) < b[4] / 2) & (np.abs(rel[:, 2]) < b[5] / 2)
        )
        keep &= ~inside
    return points[keep]
