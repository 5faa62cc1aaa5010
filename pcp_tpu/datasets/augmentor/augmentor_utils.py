"""World-level augmentation primitives (numpy, host side).

Behavior matches /root/reference/pcdet/datasets/augmentor/augmentor_utils.py
(:11-255) including the V2X-specific extensions: MoDAR point headings (column 8
of >=13-feature points where box_label > 0) are flipped/rotated alongside the
world, ``instances_tf`` correction transforms are conjugated, and the
``se3_from_ego`` agent poses in metadata are updated so DiscoNet BEV warping
stays consistent under augmentation.
"""
import numpy as np


def _rot_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def rotate_points_along_z(points, angle):
    """points (N, 3+C): rotates the first 3 columns; angle increases x->y."""
    rot = _rot_z(angle)
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot.T
    return out


def _conjugate_instances_tf(data_dict, tf):
    inv_tf = np.linalg.inv(tf)
    data_dict["instances_tf"] = np.matmul(tf[np.newaxis, np.newaxis], data_dict["instances_tf"])
    data_dict["instances_tf"] = np.matmul(data_dict["instances_tf"], inv_tf[np.newaxis, np.newaxis])


def _update_se3_from_ego(data_dict, tf):
    meta = data_dict.get("metadata", {})
    if isinstance(meta, dict) and "se3_from_ego" in meta:
        for k, tf_from_ego in meta["se3_from_ego"].items():
            # ego frame is transformed by tf; agent frames are not
            meta["se3_from_ego"][k] = np.linalg.inv(tf @ np.linalg.inv(tf_from_ego))


def _wrap_angles(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _modar_mask(points):
    # >= 13-feature layout: [...| box_score(9), box_label(10), sweep(11), inst(12)]
    return points[:, -3] > 0


def random_flip_along_x(data_dict, enable=None):
    """Mirror across the x axis: y -> -y."""
    if enable is None:
        enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    if enable:
        data_dict["gt_boxes"][:, 1] *= -1
        data_dict["gt_boxes"][:, 6] *= -1
        data_dict["points"][:, 1] *= -1
        if data_dict["gt_boxes"].shape[1] > 7:
            data_dict["gt_boxes"][:, 8] *= -1  # vy
        tf = np.diag([1.0, -1.0, 1.0, 1.0])
        if "instances_tf" in data_dict:
            _conjugate_instances_tf(data_dict, tf)
        _update_se3_from_ego(data_dict, tf)
        if data_dict["points"].shape[1] >= 13:
            m = _modar_mask(data_dict["points"])
            data_dict["points"][m, 8] *= -1  # modar heading
        if "img_map" in data_dict:  # (5, H, W): y flip = row reversal (ref :47-48)
            data_dict["img_map"] = np.ascontiguousarray(data_dict["img_map"][:, ::-1])
    return enable


def random_flip_along_y(data_dict, enable=None):
    """Mirror across the y axis: x -> -x."""
    if enable is None:
        enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    if enable:
        data_dict["gt_boxes"][:, 0] *= -1
        data_dict["gt_boxes"][:, 6] = -(data_dict["gt_boxes"][:, 6] + np.pi)
        data_dict["points"][:, 0] *= -1
        if data_dict["gt_boxes"].shape[1] > 7:
            data_dict["gt_boxes"][:, 7] *= -1  # vx
        tf = np.diag([-1.0, 1.0, 1.0, 1.0])
        if "instances_tf" in data_dict:
            _conjugate_instances_tf(data_dict, tf)
        _update_se3_from_ego(data_dict, tf)
        if data_dict["points"].shape[1] >= 13:
            m = _modar_mask(data_dict["points"])
            data_dict["points"][m, 8] = _wrap_angles(-(data_dict["points"][m, 8] + np.pi))
        if "img_map" in data_dict:  # x flip = column reversal (ref :103-104)
            data_dict["img_map"] = np.ascontiguousarray(data_dict["img_map"][:, :, ::-1])
    return enable


def global_rotation(data_dict, rot_range, noise_rotation=None):
    if noise_rotation is None:
        noise_rotation = np.random.uniform(rot_range[0], rot_range[1])
    data_dict["points"] = rotate_points_along_z(data_dict["points"], noise_rotation)
    gt = data_dict["gt_boxes"]
    gt[:, 0:3] = gt[:, 0:3] @ _rot_z(noise_rotation).T
    gt[:, 6] += noise_rotation
    if gt.shape[1] > 7:
        vel = np.hstack([gt[:, 7:9], np.zeros((gt.shape[0], 1))])
        gt[:, 7:9] = (vel @ _rot_z(noise_rotation).T)[:, :2]
    tf = np.eye(4)
    tf[:3, :3] = _rot_z(noise_rotation)
    if "instances_tf" in data_dict:
        _conjugate_instances_tf(data_dict, tf)
    _update_se3_from_ego(data_dict, tf)
    if data_dict["points"].shape[1] >= 13:
        m = _modar_mask(data_dict["points"])
        data_dict["points"][m, 8] = _wrap_angles(data_dict["points"][m, 8] + noise_rotation)
    if "img_map" in data_dict:  # rotate raster about image center (ref :172-177)
        img = data_dict["img_map"]
        try:
            import cv2

            mat = cv2.getRotationMatrix2D(
                (img.shape[2] / 2, img.shape[1] / 2), np.rad2deg(noise_rotation), 1.0
            )
            warped = cv2.warpAffine(
                img.transpose(1, 2, 0), mat, (img.shape[2], img.shape[1]),
                flags=cv2.INTER_NEAREST,
            )
            data_dict["img_map"] = np.ascontiguousarray(warped.transpose(2, 0, 1))
        except ImportError:
            from scipy.ndimage import rotate as nd_rotate

            data_dict["img_map"] = nd_rotate(
                img, np.rad2deg(noise_rotation), axes=(2, 1), reshape=False, order=0
            )
    return noise_rotation


def global_scaling(data_dict, scale_range):
    if scale_range[1] - scale_range[0] < 1e-3:
        return 1.0
    noise_scale = np.random.uniform(scale_range[0], scale_range[1])
    data_dict["points"][:, :3] *= noise_scale
    data_dict["gt_boxes"][:, :6] *= noise_scale
    if data_dict["gt_boxes"].shape[1] > 7:
        data_dict["gt_boxes"][:, 7:] *= noise_scale
    if "instances_tf" in data_dict:
        tf = np.diag([noise_scale] * 3 + [1.0])
        _conjugate_instances_tf(data_dict, tf)
    return noise_scale


def global_translation(data_dict, noise_translate_std):
    if not isinstance(noise_translate_std, (list, tuple, np.ndarray)):
        noise_translate_std = [noise_translate_std] * 3
    noise = np.array(
        [np.random.normal(0, s, 1) for s in noise_translate_std], dtype=np.float64
    ).T.reshape(3)
    data_dict["points"][:, :3] += noise
    data_dict["gt_boxes"][:, :3] += noise
    if "instances_tf" in data_dict:  # ref data_augmentor.py:126-135
        tf = np.eye(4)
        tf[:3, 3] = noise
        _conjugate_instances_tf(data_dict, tf)
    return noise


# --------------------------------------------------------------------------
# per-object ("local") and frustum augmentations
# (capability match for /root/reference/pcdet/datasets/augmentor/
#  augmentor_utils.py:317-792; box membership uses the same rotated test
#  with the reference's 0.1 m margin and |z - cz| <= dz/2)
# --------------------------------------------------------------------------

_IN_BOX_MARGIN = 1e-1


def points_in_box_mask(points, box):
    """(M, 3+C) points, (7,) box -> (M,) bool."""
    shift = points[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = shift[:, 0] * c - shift[:, 1] * s
    ly = shift[:, 0] * s + shift[:, 1] * c
    return (
        (np.abs(shift[:, 2]) <= box[5] / 2.0)
        & (np.abs(lx) <= box[3] / 2.0 + _IN_BOX_MARGIN)
        & (np.abs(ly) <= box[4] / 2.0 + _IN_BOX_MARGIN)
    )


def random_local_translation(gt_boxes, points, offset_range, axes):
    """Translate each gt box (and its points) by an independent offset along
    the given axes (reference random_local_translation_along_{x,y,z})."""
    axis_idx = {"x": 0, "y": 1, "z": 2}
    for axis in axes:
        ai = axis_idx[axis]
        for idx in range(len(gt_boxes)):
            offset = np.random.uniform(offset_range[0], offset_range[1])
            mask = points_in_box_mask(points, gt_boxes[idx])
            points[mask, ai] += offset
            gt_boxes[idx, ai] += offset
    return gt_boxes, points


def local_rotation(gt_boxes, points, rot_range):
    """Rotate each box + its points about the box center (reference :485-530)."""
    for idx in range(len(gt_boxes)):
        ang = np.random.uniform(rot_range[0], rot_range[1])
        mask = points_in_box_mask(points, gt_boxes[idx])
        center = gt_boxes[idx, :3].copy()
        points[mask, :3] = rotate_points_along_z(points[mask, :3] - center, ang) + center
        gt_boxes[idx, 6] += ang
        if gt_boxes.shape[1] > 8:  # velocity columns rotate too
            gt_boxes[idx, 7:9] = rotate_points_along_z(
                np.array([[gt_boxes[idx, 7], gt_boxes[idx, 8], 0.0]]), ang
            )[0, :2]
    return gt_boxes, points


def local_scaling(gt_boxes, points, scale_range):
    """Scale each box + its points about the box center (reference :451-482)."""
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    for idx in range(len(gt_boxes)):
        sc = np.random.uniform(scale_range[0], scale_range[1])
        mask = points_in_box_mask(points, gt_boxes[idx])
        center = gt_boxes[idx, :3]
        points[mask, :3] = (points[mask, :3] - center) * sc + center
        gt_boxes[idx, 3:6] *= sc
    return gt_boxes, points


_FRUSTUM_AXES = {"top": (2, +1), "bottom": (2, -1), "right": (1, +1), "left": (1, -1)}


def global_frustum_dropout(gt_boxes, points, intensity_range, direction):
    """Drop everything beyond a threshold slab of the scene extent along z
    (top/bottom) or y (left/right) (reference :383-448)."""
    ai, sign = _FRUSTUM_AXES[direction]
    intensity = np.random.uniform(intensity_range[0], intensity_range[1])
    lo, hi = points[:, ai].min(), points[:, ai].max()
    if sign > 0:
        thr = hi - intensity * (hi - lo)
        keep_p, keep_b = points[:, ai] < thr, gt_boxes[:, ai] < thr
    else:
        thr = lo + intensity * (hi - lo)
        keep_p, keep_b = points[:, ai] > thr, gt_boxes[:, ai] > thr
    return gt_boxes[keep_b], points[keep_p]


def local_frustum_dropout(gt_boxes, points, intensity_range, direction):
    """Per-box slab dropout of in-box points (reference :533-611)."""
    ai, sign = _FRUSTUM_AXES[direction]
    for idx in range(len(gt_boxes)):
        box = gt_boxes[idx]
        half = box[3 + ai] / 2.0
        intensity = np.random.uniform(intensity_range[0], intensity_range[1])
        mask = points_in_box_mask(points, box)
        if sign > 0:
            thr = (box[ai] + half) - intensity * box[3 + ai]
            drop = mask & (points[:, ai] >= thr)
        else:
            thr = (box[ai] - half) + intensity * box[3 + ai]
            drop = mask & (points[:, ai] <= thr)
        points = points[~drop]
    return gt_boxes, points


# ------------------------------------------------------------- pyramid aug
# SE-SSD local pyramid dropout/sparsify/swap (reference :674-792), rebuilt on
# a box-local decomposition: the 6 pyramids (apex = box center, base = face)
# partition the box by argmax of normalized |local coords|.


def _local_coords(points, box):
    shift = points[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = shift[:, 0] * c - shift[:, 1] * s
    ly = shift[:, 0] * s + shift[:, 1] * c
    return np.stack([2 * lx / box[3], 2 * ly / box[4], 2 * shift[:, 2] / box[5]], axis=1)


def _pyramid_index(uvw):
    """(M, 3) normalized local coords in [-1, 1] -> pyramid id 0..5
    (0:+x 1:-x 2:+y 3:-y 4:+z 5:-z)."""
    a = np.abs(uvw)
    axis = np.argmax(a, axis=1)
    sign = np.take_along_axis(uvw, axis[:, None], axis=1)[:, 0] < 0
    return axis * 2 + sign.astype(int)


def points_in_pyramid_mask(points, box, pyr_id):
    uvw = _local_coords(points, box)
    inside = (np.abs(uvw) <= 1.0).all(axis=1)
    return inside & (_pyramid_index(uvw) == pyr_id)


def local_pyramid_dropout(gt_boxes, points, dropout_prob):
    """Drop all points of one random pyramid per selected box; selected boxes
    are excluded from the later stages (reference :674-687)."""
    keep_pyramid = np.ones(len(gt_boxes), dtype=bool)
    for idx in range(len(gt_boxes)):
        if np.random.uniform() <= dropout_prob:
            keep_pyramid[idx] = False
            pid = np.random.randint(0, 6)
            points = points[~points_in_pyramid_mask(points, gt_boxes[idx], pid)]
    return gt_boxes, points, keep_pyramid


def local_pyramid_sparsify(gt_boxes, points, prob, max_num_pts, keep_pyramid):
    """Downsample one random pyramid per selected box to max_num_pts
    (reference :690-721)."""
    for idx in range(len(gt_boxes)):
        if not keep_pyramid[idx] or np.random.uniform() > prob:
            continue
        keep_pyramid[idx] = False
        pid = np.random.randint(0, 6)
        mask = points_in_pyramid_mask(points, gt_boxes[idx], pid)
        n = int(mask.sum())
        if n <= max_num_pts:
            continue
        inside_idx = np.where(mask)[0]
        sampled = np.random.choice(inside_idx, size=max_num_pts, replace=False)
        drop = np.ones(len(points), dtype=bool)
        drop[inside_idx] = False
        drop[sampled] = True
        points = points[drop]
    return gt_boxes, points, keep_pyramid


def _pyramid_frame_coords(uvw, pyr_id):
    """Map in-pyramid normalized coords to (alpha, beta, gamma): base-plane
    fractions in [0, 1]^2 and depth toward the apex in [0, 1]."""
    axis, neg = pyr_id // 2, pyr_id % 2
    o = [(axis + 1) % 3, (axis + 2) % 3]
    t = np.abs(uvw[:, axis])
    t = np.maximum(t, 1e-9)
    alpha = (uvw[:, o[0]] / t + 1) / 2
    beta = (uvw[:, o[1]] / t + 1) / 2
    return alpha, beta, 1.0 - t


def _pyramid_frame_to_local(alpha, beta, gamma, pyr_id):
    axis, neg = pyr_id // 2, pyr_id % 2
    o = [(axis + 1) % 3, (axis + 2) % 3]
    t = 1.0 - gamma
    uvw = np.zeros((len(alpha), 3))
    uvw[:, axis] = t * (-1 if neg else 1)
    uvw[:, o[0]] = (2 * alpha - 1) * t
    uvw[:, o[1]] = (2 * beta - 1) * t
    return uvw


def local_pyramid_swap(gt_boxes, points, prob, max_num_pts, keep_pyramid):
    """Swap the points of one pyramid between two boxes, re-expressed in each
    pyramid's (alpha, beta, gamma) frame; the last point channel (intensity
    in the reference) is min-max remapped (reference :724-792)."""
    candidates = [i for i in range(len(gt_boxes)) if keep_pyramid[i]]
    swap_sel = [i for i in candidates if np.random.uniform() <= prob]
    for idx in swap_sel:
        pid = np.random.randint(0, 6)
        mask_a = points_in_pyramid_mask(points, gt_boxes[idx], pid)
        if mask_a.sum() <= max_num_pts:
            continue
        partners = [
            j for j in candidates
            if j != idx and points_in_pyramid_mask(points, gt_boxes[j], pid).sum() > max_num_pts
        ]
        if not partners:
            continue
        jdx = int(np.random.choice(partners))
        mask_b = points_in_pyramid_mask(points, gt_boxes[jdx], pid)

        def transfer(src_mask, src_box, dst_box):
            src = points[src_mask]
            a, b, g = _pyramid_frame_coords(_local_coords(src, src_box), pid)
            uvw = _pyramid_frame_to_local(a, b, g, pid)
            local = uvw * np.array([dst_box[3], dst_box[4], dst_box[5]]) / 2.0
            c, s = np.cos(dst_box[6]), np.sin(dst_box[6])
            out = src.copy()
            out[:, 0] = local[:, 0] * c - local[:, 1] * s + dst_box[0]
            out[:, 1] = local[:, 0] * s + local[:, 1] * c + dst_box[1]
            out[:, 2] = local[:, 2] + dst_box[2]
            return out

        moved_a = transfer(mask_a, gt_boxes[idx], gt_boxes[jdx])
        moved_b = transfer(mask_b, gt_boxes[jdx], gt_boxes[idx])
        # intensity remap between the two pyramids' ranges
        for moved, src_mask in ((moved_a, mask_b), (moved_b, mask_a)):
            tgt_vals = points[src_mask][:, -1]
            lo, hi = float(tgt_vals.min()), float(tgt_vals.max())
            v = moved[:, -1]
            span = max(v.max() - v.min(), 1e-9)
            moved[:, -1] = (v - v.min()) / span * (hi - lo) + lo
        points = np.concatenate([points[~(mask_a | mask_b)], moved_a, moved_b], axis=0)
    return gt_boxes, points
