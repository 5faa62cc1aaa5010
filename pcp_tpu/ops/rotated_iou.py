"""Rotated BEV box overlap / IoU in pure JAX.

TPU-native replacement for the reference CUDA extension ``iou3d_nms_cuda``
(/root/reference/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:15-230 computes the
overlap of two rotated rectangles by enumerating corner-containment and
edge-edge intersection points, sorting them by angle and running the shoelace
formula). We implement the same geometric algorithm, but fully vectorized with
fixed shapes so XLA can fuse and tile it:

  * 24 candidate vertices per box pair (4 + 4 corners-inside, 16 edge pair
    intersections), each with a validity flag;
  * sort by polar angle around the centroid of the valid candidates, pushing
    invalid candidates to the end;
  * clamp the gather index so trailing invalid slots repeat the last valid
    vertex (contributing zero area) and run a fixed-length shoelace.

Boxes follow the pcdet convention ``[x, y, z, dx, dy, dz, heading]`` with
(x, y, z) the box center.
"""
import jax
import jax.numpy as jnp

EPS = 1e-8
# corner-containment margin: float32 rotation round-off at ~50 m coordinates is
# O(1e-5); the reference CUDA kernel (check_in_box2d) uses 1e-2
CONTAIN_MARGIN = 1e-3


def box_corners_bev(boxes):
    """BEV corners of rotated boxes.

    Args:
        boxes: (..., 7) [x, y, z, dx, dy, dz, heading]
    Returns:
        (..., 4, 2) corners in counter-clockwise order.
    """
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # local corner offsets, counter-clockwise
    lx = jnp.stack([dx, -dx, -dx, dx], axis=-1) * 0.5  # (..., 4)
    ly = jnp.stack([dy, dy, -dy, -dy], axis=-1) * 0.5
    cx = x[..., None] + lx * cos[..., None] - ly * sin[..., None]
    cy = y[..., None] + lx * sin[..., None] + ly * cos[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _point_in_rect(pts, box):
    """pts: (P, 2), box: (7,) -> (P,) bool; rotate into box frame, bounds test."""
    c, s = jnp.cos(box[6]), jnp.sin(box[6])
    rx = pts[:, 0] - box[0]
    ry = pts[:, 1] - box[1]
    local_x = c * rx + s * ry
    local_y = -s * rx + c * ry
    return (jnp.abs(local_x) <= box[3] * 0.5 + CONTAIN_MARGIN) & (
        jnp.abs(local_y) <= box[4] * 0.5 + CONTAIN_MARGIN
    )


def _segment_intersections(corners_a, corners_b):
    """All 16 intersection points between edges of two quads.

    Returns (16, 2) points and (16,) validity.
    """
    a0 = corners_a  # (4, 2)
    a1 = jnp.roll(corners_a, -1, axis=0)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=0)

    # broadcast to (4, 4, 2): a-edge i vs b-edge j
    p = a0[:, None, :]
    r = (a1 - a0)[:, None, :]
    q = b0[None, :, :]
    s = (b1 - b0)[None, :, :]

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (4, 4)
    qp = q - p
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]

    denom = jnp.where(jnp.abs(rxs) < EPS, jnp.where(rxs < 0, -EPS, EPS), rxs)
    t = qpxs / denom
    u = qpxr / denom
    valid = (jnp.abs(rxs) >= EPS) & (t >= -EPS) & (t <= 1 + EPS) & (u >= -EPS) & (u <= 1 + EPS)
    pts = p + t[..., None] * r  # (4, 4, 2)
    return pts.reshape(16, 2), valid.reshape(16)


def _pair_overlap_bev(box_a, box_b):
    """Overlap area of two rotated BEV rectangles. box_a/box_b: (7,) -> scalar."""
    ca = box_corners_bev(box_a[None])[0]  # (4, 2)
    cb = box_corners_bev(box_b[None])[0]

    in_b = _point_in_rect(ca, box_b)  # (4,)
    in_a = _point_in_rect(cb, box_a)
    ipts, ivalid = _segment_intersections(ca, cb)  # (16, 2), (16,)

    pts = jnp.concatenate([ca, cb, ipts], axis=0)        # (24, 2)
    valid = jnp.concatenate([in_b, in_a, ivalid], axis=0)  # (24,)

    num_valid = jnp.sum(valid)
    w = valid.astype(pts.dtype)
    center = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(num_valid, 1)

    rel = pts - center
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    # push invalid candidates past any real angle so they sort last
    key = jnp.where(valid, ang, 1e9 + jnp.arange(24, dtype=pts.dtype))
    order = jnp.argsort(key)
    sorted_pts = pts[order]

    # index clamp: slots >= num_valid repeat the last valid vertex -> zero-area edges
    idx = jnp.minimum(jnp.arange(24), jnp.maximum(num_valid - 1, 0))
    poly = sorted_pts[idx]
    nxt = jnp.roll(poly, -1, axis=0)
    area2 = jnp.sum(poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1])
    area = 0.5 * jnp.abs(area2)
    return jnp.where(num_valid >= 3, area, 0.0)


def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV overlap area.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
    Returns:
        (N, M) overlap areas.
    """
    fn = jax.vmap(jax.vmap(_pair_overlap_bev, in_axes=(None, 0)), in_axes=(0, None))
    return fn(boxes_a, boxes_b)


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU, matching the semantics of the reference
    ``boxes_iou_bev`` (iou3d_nms_utils.py:31-45)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, min=1e-6)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU: rotated BEV overlap x z-extent overlap
    (reference iou3d_nms_utils.py:48-81)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)

    a_max = (boxes_a[:, 2] + boxes_a[:, 5] * 0.5)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] * 0.5)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] * 0.5)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] * 0.5)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0.0)

    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned BEV IoU (reference ``nms_normal_gpu`` ignores rotation)."""
    ax_min = (boxes_a[:, 0] - boxes_a[:, 3] * 0.5)[:, None]
    ax_max = (boxes_a[:, 0] + boxes_a[:, 3] * 0.5)[:, None]
    ay_min = (boxes_a[:, 1] - boxes_a[:, 4] * 0.5)[:, None]
    ay_max = (boxes_a[:, 1] + boxes_a[:, 4] * 0.5)[:, None]
    bx_min = (boxes_b[:, 0] - boxes_b[:, 3] * 0.5)[None, :]
    bx_max = (boxes_b[:, 0] + boxes_b[:, 3] * 0.5)[None, :]
    by_min = (boxes_b[:, 1] - boxes_b[:, 4] * 0.5)[None, :]
    by_max = (boxes_b[:, 1] + boxes_b[:, 4] * 0.5)[None, :]
    ix = jnp.clip(jnp.minimum(ax_max, bx_max) - jnp.maximum(ax_min, bx_min), min=0.0)
    iy = jnp.clip(jnp.minimum(ay_max, by_max) - jnp.maximum(ay_min, by_min), min=0.0)
    inter = ix * iy
    area_a = ((ax_max - ax_min) * (ay_max - ay_min))
    area_b = ((bx_max - bx_min) * (by_max - by_min))
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)
