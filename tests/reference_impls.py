"""Independent numpy reference implementations used only for differential
testing. These deliberately use a *different* algorithm from the production
JAX ops (Sutherland–Hodgman half-plane clipping in plain Python vs the
vectorized candidate-point + angular-sort method)."""
import numpy as np


def rect_corners(box):
    """box: [x, y, z, dx, dy, dz, yaw] -> (4, 2) BEV corners CCW."""
    x, y, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
    c, s = np.cos(yaw), np.sin(yaw)
    pts = []
    for lx, ly in [(dx / 2, dy / 2), (-dx / 2, dy / 2), (-dx / 2, -dy / 2), (dx / 2, -dy / 2)]:
        pts.append((x + lx * c - ly * s, y + lx * s + ly * c))
    return np.array(pts)


def clip_polygon(poly, a, b):
    """Clip polygon by the half-plane left of directed edge a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        side_cur = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0])
        side_nxt = (b[0] - a[0]) * (nxt[1] - a[1]) - (b[1] - a[1]) * (nxt[0] - a[0])
        if side_cur >= 0:
            out.append(cur)
        if (side_cur > 0) != (side_nxt > 0) and side_cur != side_nxt:
            t = side_cur / (side_cur - side_nxt)
            out.append(cur + t * (nxt - cur))
    return out


def poly_area(poly):
    if len(poly) < 3:
        return 0.0
    poly = np.asarray(poly)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def overlap_bev_ref(box_a, box_b):
    poly = list(rect_corners(box_a))
    cb = rect_corners(box_b)
    for i in range(4):
        poly = clip_polygon(poly, cb[i], cb[(i + 1) % 4])
        if not poly:
            return 0.0
    return poly_area(poly)


def iou_bev_ref(box_a, box_b):
    ov = overlap_bev_ref(box_a, box_b)
    area_a = box_a[3] * box_a[4]
    area_b = box_b[3] * box_b[4]
    return ov / max(area_a + area_b - ov, 1e-6)


def iou_3d_ref(box_a, box_b):
    ov = overlap_bev_ref(box_a, box_b)
    za0, za1 = box_a[2] - box_a[5] / 2, box_a[2] + box_a[5] / 2
    zb0, zb1 = box_b[2] - box_b[5] / 2, box_b[2] + box_b[5] / 2
    h = max(0.0, min(za1, zb1) - max(za0, zb0))
    inter = ov * h
    vol_a = box_a[3] * box_a[4] * box_a[5]
    vol_b = box_b[3] * box_b[4] * box_b[5]
    return inter / max(vol_a + vol_b - inter, 1e-6)


def greedy_nms_ref(boxes, scores, thresh):
    """Plain-python greedy rotated NMS; returns kept original indices in
    descending-score order."""
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou_bev_ref(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return keep
