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


def _clip_halfplane(verts, count, a, b):
    """One Sutherland–Hodgman clip of a convex polygon by the half-plane left
    of directed edge a->b, with fixed-size buffers (sort-free, gather-free:
    compaction is a one-hot matmul, so the whole clip is VPU/MXU work).

    Args:
        verts: (V, 2) vertex buffer, first `count` entries valid.
        count: scalar int32 number of valid vertices.
        a, b: (2,) clip edge endpoints.
    Returns:
        (V, 2) new buffer, new count.
    """
    v = verts.shape[0]
    idx = jnp.arange(v)
    in_poly = idx < count
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = verts[nxt_idx]  # tiny gather over 8 rows — fine

    d = b - a
    side_cur = d[0] * (verts[:, 1] - a[1]) - d[1] * (verts[:, 0] - a[0])
    side_nxt = d[0] * (nxt[:, 1] - a[1]) - d[1] * (nxt[:, 0] - a[0])

    # tolerance in *distance* units (side = dist * |d|): vertices exactly on
    # the clip line (identical/touching boxes) must survive float round-off
    tol = 1e-4 * jnp.sqrt(d[0] * d[0] + d[1] * d[1])
    inside_cur = side_cur >= -tol
    inside_nxt = side_nxt >= -tol
    keep_cur = in_poly & inside_cur
    # crossing uses the same tolerance-shifted classification as keep_cur so a
    # vertex on the line never emits both itself and a duplicate intersection
    # (which would overflow the fixed 8-slot buffer)
    crossing = in_poly & (inside_cur != inside_nxt) & (side_cur != side_nxt)
    denom = jnp.where(side_cur == side_nxt, 1.0, side_cur - side_nxt)
    t = side_cur / denom
    inter = verts + t[:, None] * (nxt - verts)

    # interleave emission slots: [v0, x0, v1, x1, ...] -> (2V, 2)
    cand = jnp.stack([verts, inter], axis=1).reshape(2 * v, 2)
    cand_valid = jnp.stack([keep_cur, crossing], axis=1).reshape(2 * v)

    pos = jnp.cumsum(cand_valid) - 1  # output slot per valid candidate
    onehot = (
        (pos[:, None] == jnp.arange(v)[None, :]) & cand_valid[:, None]
    ).astype(verts.dtype)  # (2V, V)
    out = onehot.T @ cand  # (V, 2)
    new_count = jnp.sum(cand_valid).astype(count.dtype)
    return out, jnp.minimum(new_count, v)


def _pair_overlap_bev(box_a, box_b):
    """Overlap area of two rotated BEV rectangles via 4 half-plane clips.
    box_a/box_b: (7,) -> scalar. Sort-free; every op is elementwise or an
    8x16 matmul, so the 500x500 NMS IoU matrix stays on the VPU."""
    ca = box_corners_bev(box_a[None])[0]  # (4, 2) CCW
    cb = box_corners_bev(box_b[None])[0]

    verts = jnp.zeros((8, 2), dtype=ca.dtype).at[:4].set(ca)
    count = jnp.asarray(4, jnp.int32)
    for i in range(4):
        verts, count = _clip_halfplane(verts, count, cb[i], cb[(i + 1) % 4])

    idx = jnp.arange(8)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = verts[nxt_idx]
    mask = (idx < count).astype(verts.dtype)
    area2 = jnp.sum((verts[:, 0] * nxt[:, 1] - nxt[:, 0] * verts[:, 1]) * mask)
    area = 0.5 * jnp.abs(area2)
    return jnp.where(count >= 3, area, 0.0)


def _pair_overlap_bev_sorted(box_a, box_b):
    """Overlap area of two rotated BEV rectangles via candidate points +
    angular sort — the original scalar formulation, kept as an independent
    second implementation for cross-checks (production path is the SoA
    ``boxes_overlap_bev``; scalar SH variant is ``_pair_overlap_bev``).
    box_a/box_b: (7,) -> scalar."""
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


def _bitonic_sort_axis0(key, vals):
    """Ascending bitonic sort along axis 0 (power-of-two length), carrying
    ``vals`` alongside the key. ``jax.lax.sort`` unrolls into an enormous HLO
    for multi-operand sorts on (24, 500, 500)-shaped inputs (O(minutes)
    compile); this explicit network is ~15 reshape+min/max phases and
    compiles instantly."""
    n = key.shape[0]
    assert (n & (n - 1)) == 0, "length must be a power of two"
    tail = key.shape[1:]

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            groups = n // (2 * j)
            shp = (groups, 2, j) + tail
            kk = key.reshape(shp)
            lo, hi = kk[:, 0], kk[:, 1]
            a_idx = jnp.arange(groups) * 2 * j
            up = ((a_idx & k) == 0).reshape((groups,) + (1,) * (len(tail) + 1))
            swap = jnp.where(up, lo > hi, lo < hi)
            new_lo = jnp.where(swap, hi, lo)
            new_hi = jnp.where(swap, lo, hi)
            key = jnp.stack([new_lo, new_hi], axis=1).reshape((n,) + tail)
            new_vals = []
            for v in vals:
                vv = v.reshape(shp)
                vlo, vhi = vv[:, 0], vv[:, 1]
                nlo = jnp.where(swap, vhi, vlo)
                nhi = jnp.where(swap, vlo, vhi)
                new_vals.append(jnp.stack([nlo, nhi], axis=1).reshape((n,) + tail))
            vals = new_vals
            j //= 2
        k *= 2
    return key, vals


def _edge_clip_contrib(boxes_a, boxes_b, inset):
    """Sum of shoelace cross-contributions of A's edges clipped to box B.

    For every (i, j) pair: transform A_i's corners into B_j's local frame,
    clip each of the 4 CCW edges against the axis-aligned rectangle
    |x| <= dxB/2 - inset, |y| <= dyB/2 - inset (slab / Liang-Barsky), and sum
    cross(p0 - o, p1 - o) over the clipped segments, with o the midpoint of
    the two box centers (expressed in B's frame). Rotation preserves cross
    products, so contributions from different local frames add up coherently.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7), inset: scalar boundary inset for B.
    Returns:
        (N, M) summed cross contributions (= 2x the signed area swept by
        A-edge portions inside B, CCW positive).
    """
    big = jnp.asarray(1e9, boxes_a.dtype)

    xa, ya, yawa = boxes_a[:, 0][:, None], boxes_a[:, 1][:, None], boxes_a[:, 6][:, None]
    dxa, dya = boxes_a[:, 3][:, None], boxes_a[:, 4][:, None]
    xb, yb, yawb = boxes_b[:, 0][None, :], boxes_b[:, 1][None, :], boxes_b[:, 6][None, :]
    dxb, dyb = boxes_b[:, 3][None, :], boxes_b[:, 4][None, :]

    # A's center and axes in B's local frame
    cb_, sb_ = jnp.cos(yawb), jnp.sin(yawb)
    rx, ry = xa - xb, ya - yb
    tx = cb_ * rx + sb_ * ry            # (N, M) A-center in B frame
    ty = -sb_ * rx + cb_ * ry
    th = yawa - yawb
    ct, st = jnp.cos(th), jnp.sin(th)

    hx = dxb * 0.5 - inset
    hy = dyb * 0.5 - inset
    # reference point o = midpoint of centers, in B frame = t/2
    ox, oy = tx * 0.5, ty * 0.5

    # CCW local corners of A: (+,+), (-,+), (-,-), (+,-) scaled by half-dims
    lxs = (0.5, -0.5, -0.5, 0.5)
    lys = (0.5, 0.5, -0.5, -0.5)
    cxs, cys = [], []
    for k in range(4):
        lx = dxa * lxs[k]
        ly = dya * lys[k]
        cxs.append(tx + lx * ct - ly * st)
        cys.append(ty + lx * st + ly * ct)

    total = jnp.zeros_like(tx)
    for k in range(4):
        x0, y0 = cxs[k], cys[k]
        x1, y1 = cxs[(k + 1) % 4], cys[(k + 1) % 4]
        dx, dy = x1 - x0, y1 - y0

        # x-slab
        par_x = jnp.abs(dx) < EPS
        inv_dx = 1.0 / jnp.where(par_x, EPS, dx)
        t1x = (-hx - x0) * inv_dx
        t2x = (hx - x0) * inv_dx
        in_x = jnp.abs(x0) <= hx
        txmin = jnp.where(par_x, jnp.where(in_x, -big, big), jnp.minimum(t1x, t2x))
        txmax = jnp.where(par_x, jnp.where(in_x, big, -big), jnp.maximum(t1x, t2x))
        # y-slab
        par_y = jnp.abs(dy) < EPS
        inv_dy = 1.0 / jnp.where(par_y, EPS, dy)
        t1y = (-hy - y0) * inv_dy
        t2y = (hy - y0) * inv_dy
        in_y = jnp.abs(y0) <= hy
        tymin = jnp.where(par_y, jnp.where(in_y, -big, big), jnp.minimum(t1y, t2y))
        tymax = jnp.where(par_y, jnp.where(in_y, big, -big), jnp.maximum(t1y, t2y))

        t0 = jnp.maximum(jnp.maximum(txmin, tymin), 0.0)
        t1 = jnp.minimum(jnp.minimum(txmax, tymax), 1.0)
        hit = t1 > t0

        ux = x0 + t0 * dx - ox
        uy = y0 + t0 * dy - oy
        vx = x0 + t1 * dx - ox
        vy = y0 + t1 * dy - oy
        total = total + jnp.where(hit, ux * vy - uy * vx, 0.0)
    return total


def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV overlap area by edge clipping, TPU-layout-native.

    Semantics match the reference CUDA kernel's polygon-intersection area
    (/root/reference/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:110-230),
    computed by a different (sort-free) exact algorithm: the boundary of
    A ∩ B consists of the portions of A's edges inside B plus the portions
    of B's edges inside A, and the shoelace formula is additive per directed
    edge about any common origin — so the area is the sum of per-edge clipped
    cross-contributions, no angular sort of intersection vertices needed.
    Every op is elementwise over the (N, M) pair grid (VPU-friendly); the
    per-pair cost is ~4x cheaper than the candidate-sort formulation (kept as
    ``_boxes_overlap_bev_sorted_soa`` for cross-checks).

    Coincident-boundary cases (identical boxes, shared edges — common in
    late-fusion dedup) would double- or single-count coincident segments, so
    we average two runs: one clipping against an ``inset``-shrunk B / full A,
    one against full B / shrunk A. In general position both runs are exact
    (up to O(inset) endpoint shift); for coincident boundaries the traversal
    directions make the spurious terms cancel and each boundary count once.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
    Returns:
        (N, M) overlap areas.
    """
    inset = jnp.asarray(1e-4, boxes_a.dtype)
    zero = jnp.asarray(0.0, boxes_a.dtype)
    # run1: A edges vs shrunk B, B edges vs full A
    # run2: A edges vs full B,  B edges vs shrunk A
    # B-edge contributions are computed in A's frame; cross products are
    # rotation-invariant and both runs share origin o = midpoint of centers.
    a_shrunk = _edge_clip_contrib(boxes_a, boxes_b, inset)
    a_full = _edge_clip_contrib(boxes_a, boxes_b, zero)
    b_shrunk = _edge_clip_contrib(boxes_b, boxes_a, inset).T
    b_full = _edge_clip_contrib(boxes_b, boxes_a, zero).T
    area2 = 0.5 * ((a_shrunk + b_full) + (a_full + b_shrunk))  # 2 x area
    area = 0.5 * area2
    max_area = jnp.minimum(
        (boxes_a[:, 3] * boxes_a[:, 4])[:, None],
        (boxes_b[:, 3] * boxes_b[:, 4])[None, :],
    )
    return jnp.clip(area, zero, max_area)


def _boxes_overlap_bev_sorted_soa(boxes_a, boxes_b):
    """Candidate-vertex + angular-sort formulation (struct-of-arrays layout,
    explicit bitonic network) — the round-1 production path, kept as an
    independent second implementation for differential tests.

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
    Returns:
        (N, M) overlap areas.
    """
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca = box_corners_bev(boxes_a)  # (N, 4, 2)
    cb = box_corners_bev(boxes_b)  # (M, 4, 2)

    # SoA planes: leading axis is the corner/candidate slot
    ax = jnp.transpose(ca[..., 0])[:, :, None]  # (4, N, 1)
    ay = jnp.transpose(ca[..., 1])[:, :, None]
    bx = jnp.transpose(cb[..., 0])[:, None, :]  # (4, 1, M)
    by = jnp.transpose(cb[..., 1])[:, None, :]

    def in_rect(px, py, boxes, transpose):
        # px/py: (4, N, M)-broadcastable; boxes: (K, 7) on the axis given
        if transpose:  # boxes vary along M
            cxy = boxes[None, None, :, :]
            cx, cy = cxy[..., 0], cxy[..., 1]
            dx, dy = cxy[..., 3], cxy[..., 4]
            cos = jnp.cos(cxy[..., 6])
            sin = jnp.sin(cxy[..., 6])
        else:  # boxes vary along N
            cxy = boxes[None, :, None, :]
            cx, cy = cxy[..., 0], cxy[..., 1]
            dx, dy = cxy[..., 3], cxy[..., 4]
            cos = jnp.cos(cxy[..., 6])
            sin = jnp.sin(cxy[..., 6])
        rx = px - cx
        ry = py - cy
        lx = cos * rx + sin * ry
        ly = -sin * rx + cos * ry
        return (jnp.abs(lx) <= dx * 0.5 + CONTAIN_MARGIN) & (
            jnp.abs(ly) <= dy * 0.5 + CONTAIN_MARGIN
        )

    a_in_b = in_rect(ax, ay, boxes_b, transpose=True)   # (4, N, M)
    b_in_a = in_rect(bx, by, boxes_a, transpose=False)  # (4, N, M)

    # edge-pair intersections: A edge i (4) x B edge j (4) -> 16 planes
    ax0, ay0 = ax, ay
    ax1, ay1 = jnp.roll(ax, -1, axis=0), jnp.roll(ay, -1, axis=0)
    bx0, by0 = bx, by
    bx1, by1 = jnp.roll(bx, -1, axis=0), jnp.roll(by, -1, axis=0)

    # broadcast (4a, 4b, N, M)
    p_x, p_y = ax0[:, None], ay0[:, None]
    r_x, r_y = (ax1 - ax0)[:, None], (ay1 - ay0)[:, None]
    q_x, q_y = bx0[None], by0[None]
    s_x, s_y = (bx1 - bx0)[None], (by1 - by0)[None]

    rxs = r_x * s_y - r_y * s_x
    qp_x, qp_y = q_x - p_x, q_y - p_y
    qpxr = qp_x * r_y - qp_y * r_x
    qpxs = qp_x * s_y - qp_y * s_x
    denom = jnp.where(jnp.abs(rxs) < EPS, jnp.where(rxs < 0, -EPS, EPS), rxs)
    t = qpxs / denom
    u = qpxr / denom
    ivalid = (jnp.abs(rxs) >= EPS) & (t >= -EPS) & (t <= 1 + EPS) & (u >= -EPS) & (u <= 1 + EPS)
    ix = p_x + t * r_x
    iy = p_y + t * r_y

    z = jnp.zeros((n, m), dtype=boxes_a.dtype)
    xs = jnp.concatenate([ax + (by * 0), bx + (ay * 0), ix.reshape(16, n, m)], axis=0)
    ys = jnp.concatenate([ay + (bx * 0), by + (ax * 0), iy.reshape(16, n, m)], axis=0)
    valid = jnp.concatenate([a_in_b, b_in_a, ivalid.reshape(16, n, m)], axis=0)  # (24,N,M)

    w = valid.astype(xs.dtype)
    num_valid = jnp.sum(w, axis=0)  # (N, M)
    denom_c = jnp.maximum(num_valid, 1.0)
    cx_c = jnp.sum(xs * w, axis=0) / denom_c
    cy_c = jnp.sum(ys * w, axis=0) / denom_c

    ang = jnp.arctan2(ys - cy_c[None], xs - cx_c[None])
    slot = jnp.arange(24, dtype=xs.dtype)[:, None, None] + z[None]
    key = jnp.where(valid, ang, 1e9 + slot)
    # pad 24 -> 32 slots (power of two) with +inf keys for the bitonic network
    pad = jnp.full((8, n, m), 2e9, dtype=xs.dtype)
    key_p = jnp.concatenate([key, pad], axis=0)
    xs_p = jnp.concatenate([xs, jnp.zeros((8, n, m), xs.dtype)], axis=0)
    ys_p = jnp.concatenate([ys, jnp.zeros((8, n, m), ys.dtype)], axis=0)
    _, (xs_s, ys_s) = _bitonic_sort_axis0(key_p, (xs_p, ys_p))
    xs_s, ys_s = xs_s[:24], ys_s[:24]

    # shoelace over the first num_valid sorted slots, closed by (last -> first)
    i = jnp.arange(24)[:, None, None]
    nxt_x = jnp.roll(xs_s, -1, axis=0)
    nxt_y = jnp.roll(ys_s, -1, axis=0)
    seg_mask = (i + 1 < num_valid[None]).astype(xs.dtype)
    cross = xs_s * nxt_y - nxt_x * ys_s
    area2 = jnp.sum(cross * seg_mask, axis=0)

    last_onehot = (i == (num_valid[None] - 1)).astype(xs.dtype)
    last_x = jnp.sum(xs_s * last_onehot, axis=0)
    last_y = jnp.sum(ys_s * last_onehot, axis=0)
    first_x, first_y = xs_s[0], ys_s[0]
    area2 = area2 + (last_x * first_y - first_x * last_y)

    area = 0.5 * jnp.abs(area2)
    return jnp.where(num_valid >= 3, area, 0.0)


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
