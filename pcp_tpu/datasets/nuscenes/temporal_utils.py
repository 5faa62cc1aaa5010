"""Instance-centric temporal sweep assembly (the HunterJr/Aligner
pretraining sample builder for nuScenes).

Behavioral counterpart of
/root/reference/pcdet/datasets/nuscenes/rev_get_sweeps_instance_centric.py:37-217
and nuscenes_temporal_utils.py: aggregate N sweeps into the target lidar
frame, track every annotated instance across sweeps, emit per-instance
correction transforms `instances_tf[i, s] = pose_last @ inv(pose_s)`, tag
each point with (sweep_idx, instance_idx), and produce the latest box per
instance (+velocity channels).

The devkit-dependent data fetching is isolated in
`revised_instance_centric_get_sweeps` (loud-fails without nuscenes-devkit);
the geometry below is devkit-free and unit-tested on synthetic trajectories.
"""
import numpy as np

from ...utils.geometry import apply_se3


def build_instance_centric_sample(sweep_points, sweep_instance_boxes, n_sweeps,
                                  instance_sizes=None, instance_names=None,
                                  instance_velocities=None):
    """Devkit-free core.

    Args:
        sweep_points: list over sweeps of (N_s, >=6) arrays — x, y, z,
            intensity, time_lag, sweep_idx — already in the TARGET frame.
        sweep_instance_boxes: list over sweeps of dicts
            {instance_key: box7 (x y z dx dy dz yaw) in the target frame}.
        n_sweeps: static sweep budget of instances_tf's second axis.
        instance_sizes / instance_names / instance_velocities: optional
            {instance_key: value} maps; sizes default to each instance's
            first box dims, velocities to zeros.

    Returns dict with keys points (N, 7: ... sweep_idx instance_idx),
    instances_tf (N_inst, n_sweeps, 4, 4), gt_boxes (N_inst, 9), gt_names.
    """
    points = (np.concatenate([p for p in sweep_points if len(p)], axis=0)
              if any(len(p) for p in sweep_points) else np.zeros((0, 6)))

    inst_order = []
    inst_poses = {}
    for boxes in sweep_instance_boxes:
        for key, box in boxes.items():
            if key not in inst_poses:
                inst_poses[key] = []
                inst_order.append(key)
            c, s = np.cos(box[6]), np.sin(box[6])
            pose = np.eye(4)
            pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pose[:3, 3] = box[:3]
            inst_poses[key].append((pose, np.asarray(box[3:6], np.float64)))

    num_inst = len(inst_order)
    if num_inst == 0:
        pts = np.concatenate([points, -np.ones((points.shape[0], 1))], axis=1)
        return {"points": pts, "instances_tf": np.zeros((0, n_sweeps, 4, 4)),
                "gt_boxes": np.zeros((0, 9)), "gt_names": np.array([])}

    instances_tf = np.zeros((num_inst, n_sweeps, 4, 4))
    all_boxes, all_inst_idx = [], []
    last_boxes = np.zeros((num_inst, 9))
    names = []
    for i, key in enumerate(inst_order):
        entries = inst_poses[key]
        poses = np.stack([p for p, _ in entries], axis=0)
        size = (np.asarray(instance_sizes[key])
                if instance_sizes and key in instance_sizes else entries[0][1])
        # correction transforms: last pose times inverse of each historical
        # pose (reference :162-165)
        instances_tf[i, : poses.shape[0]] = np.einsum(
            "ij,bjk->bik", poses[-1], np.linalg.inv(poses))
        yaw = np.arctan2(poses[:, 1, 0], poses[:, 0, 0])
        boxes7 = np.concatenate(
            [poses[:, :3, 3], np.tile(size, (poses.shape[0], 1)), yaw[:, None]],
            axis=1)
        all_boxes.append(boxes7)
        all_inst_idx.extend([i] * poses.shape[0])
        vel = (np.asarray(instance_velocities[key])[:2]
               if instance_velocities and key in instance_velocities else np.zeros(2))
        last_boxes[i] = np.concatenate([boxes7[-1], vel])
        names.append(instance_names[key] if instance_names and key in instance_names
                     else "car")

    # points -> instance correspondence over every historical box
    all_boxes = np.concatenate(all_boxes, axis=0)
    all_inst_idx = np.asarray(all_inst_idx, np.int64)
    if points.shape[0]:
        import jax.numpy as jnp

        from ...ops.points_in_boxes import points_in_boxes

        box_ids = np.asarray(points_in_boxes(
            jnp.asarray(points[:, :3], jnp.float32),
            jnp.asarray(all_boxes, jnp.float32)))
        pts_inst = np.where(box_ids >= 0, all_inst_idx[np.clip(box_ids, 0, None)], -1)
    else:
        pts_inst = np.zeros((0,), np.int64)
    pts = np.concatenate([points, pts_inst[:, None].astype(np.float64)], axis=1)
    return {"points": pts, "instances_tf": instances_tf,
            "gt_boxes": last_boxes, "gt_names": np.asarray(names)}


def remove_ego_vehicle_points(points, center_radius=2.0):
    """Reference rev_get_sweeps_instance_centric.py:32-34."""
    keep = np.linalg.norm(points[:, :2], axis=1) > center_radius
    return points[keep]


def revised_instance_centric_get_sweeps(nusc, sample_token, n_sweeps,
                                        detection_classes=("car", "pedestrian", "bicycle"),
                                        center_radius=2.0, **kwargs):
    """Devkit-gated wrapper reproducing the reference's data fetching."""
    try:
        from nuscenes.utils.geometry_utils import transform_matrix  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "revised_instance_centric_get_sweeps needs nuscenes-devkit; the "
            "geometric core (build_instance_centric_sample) works without it"
        ) from e
    from pyquaternion import Quaternion

    def sensor_pose(sd_token):
        sd = nusc.get("sample_data", sd_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        ego = nusc.get("ego_pose", sd["ego_pose_token"])
        def tf(rec):
            m = np.eye(4)
            m[:3, :3] = Quaternion(rec["rotation"]).rotation_matrix
            m[:3, 3] = rec["translation"]
            return m
        return tf(ego) @ tf(cs)

    sample_rec = nusc.get("sample", sample_token)
    target_sd = sample_rec["data"]["LIDAR_TOP"]
    target_from_glob = np.linalg.inv(sensor_pose(target_sd))
    target_time = nusc.get("sample_data", target_sd)["timestamp"]

    sd_tokens = []
    sd = target_sd
    for _ in range(n_sweeps):
        sd_tokens.append(sd)
        prev = nusc.get("sample_data", sd)["prev"]
        if prev == "":
            break
        sd = prev
    sd_tokens = sd_tokens[::-1]  # oldest first, target last

    sweep_points, sweep_boxes = [], []
    sizes, names, velos = {}, {}, {}
    for s_idx, sd_token in enumerate(sd_tokens):
        rec = nusc.get("sample_data", sd_token)
        pts = np.fromfile(str(nusc.get_sample_data_path(sd_token)),
                          dtype=np.float32).reshape(-1, 5)[:, :4]
        time_lag = (target_time - rec["timestamp"]) * 1e-6
        pts = np.concatenate(
            [pts, np.full((pts.shape[0], 1), time_lag),
             np.full((pts.shape[0], 1), s_idx)], axis=1)
        pts = remove_ego_vehicle_points(pts, center_radius)
        glob_from_cur = sensor_pose(sd_token)
        pts[:, :3] = apply_se3(target_from_glob @ glob_from_cur, points=pts[:, :3])
        sweep_points.append(pts)

        boxes = {}
        for box in nusc.get_boxes(sd_token):
            anno = nusc.get("sample_annotation", box.token)
            if anno["num_lidar_pts"] < 1:
                continue
            key = anno["instance_token"]
            glob_from_box = np.eye(4)
            glob_from_box[:3, :3] = box.orientation.rotation_matrix
            glob_from_box[:3, 3] = box.center
            t = target_from_glob @ glob_from_box
            yaw = np.arctan2(t[1, 0], t[0, 0])
            boxes[key] = np.array([*t[:3, 3], box.wlh[1], box.wlh[0], box.wlh[2], yaw])
            sizes.setdefault(key, [box.wlh[1], box.wlh[0], box.wlh[2]])
            names.setdefault(key, box.name)
            v = nusc.box_velocity(anno["token"])
            velos[key] = (target_from_glob[:3, :3] @ v)[:3]
        sweep_boxes.append(boxes)

    out = build_instance_centric_sample(
        sweep_points, sweep_boxes, n_sweeps,
        instance_sizes=sizes, instance_names=names, instance_velocities=velos)
    out["target_from_glob"] = target_from_glob
    return out
