"""Online collaborative inference demo — the full pipeline WITHOUT the
exchange database.

Counterpart of /root/reference/workspace/visualize_collab.py: builds agent
models (rsu + car) and the collaborative ego model; per sample, runs the
agents on their t-1 point clouds, takes their predicted boxes as MoDAR points
and their foreground scene flow, propagates the MoDAR forward in time
(``propagate_modar``, :118-142), transforms into the ego frame, concatenates
with the ego's raw cloud and runs the collab model. Renders a BEV matplotlib
figure (headless; the reference used Open3D).
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets.v2x_sim.source import SyntheticV2XSource, NUM_AGENTS
from pcp_tpu.datasets.v2x_sim.v2x_sim_utils import get_pseudo_sweeps_of_1lidar
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.native import points_in_boxes_np
from pcp_tpu.train.checkpoint import load_params_from_file
from pcp_tpu.utils.geometry import se3_inverse, apply_se3

_REPO = Path(__file__).resolve().parent.parent
EGO_ID = 1


def propagate_modar(mo_pts, foreground):
    """Advance MoDAR boxes by 2x the mean scene flow of their foreground
    points (constant-velocity async compensation, reference :118-142).

    Args:
        mo_pts: (N, 9) box7, score, label; foreground: (M, 13) point5, sweep,
            inst, cls_prob3, flow3.
    """
    if mo_pts.shape[0] == 0 or foreground.shape[0] == 0:
        return mo_pts
    box_idx = points_in_boxes_np(foreground[:, :3], mo_pts[:, :7])
    for b in np.unique(box_idx[box_idx >= 0]):
        flow = foreground[box_idx == b, -3:].mean(axis=0)
        mo_pts[b, :3] += 2.0 * flow
    return mo_pts


def _pad_batch(points, cap=32768):
    out = np.zeros((1, cap, points.shape[1]), np.float32)
    mask = np.zeros((1, cap), bool)
    n = min(points.shape[0], cap)
    out[0, :n] = points[:n]
    mask[0, :n] = True
    return out, mask


def build_model(cfg_path, num_feats_override=None):
    cfg = CfgDict()
    cfg_from_yaml_file(str(cfg_path), cfg)
    info = DatasetInfo.from_data_cfg(cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset_info=info)
    return cfg, info, model


def main(out_png="collab_demo.png", agent_ckpt=None, ego_ckpt=None, kf=2, scene=0):
    source = SyntheticV2XSource(num_scenes=2, keyframes_per_scene=6)
    sc = source.scenes[scene]

    cfg_car, info_car, model_car = build_model(
        _REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_car.yaml"
    )
    cfg_ego, info_ego, model_ego = build_model(
        _REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml"
    )

    def init_vars(model, num_feats, ckpt):
        if ckpt:
            return load_params_from_file(ckpt)
        pts, mask = _pad_batch(np.zeros((16, num_feats), np.float32))
        return model.init(
            jax.random.PRNGKey(0),
            {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask), "batch_size": 1},
            train=False,
        )

    vars_car = init_vars(model_car, 7, agent_ckpt)
    vars_ego = init_vars(model_ego, 13, ego_ckpt)

    ego_token_now = source.lidar_token(sc, kf, EGO_ID)
    ego_se3_glob = se3_inverse(source.get_pose(ego_token_now))

    # ---- each agent runs its detector on its t-1 cloud
    all_modar = []
    for lid in range(NUM_AGENTS):
        if lid == EGO_ID:
            continue
        token_prev = source.lidar_token(sc, kf - 1, lid)
        stuff = get_pseudo_sweeps_of_1lidar(source, token_prev, 10, ("car",),
                                            threshold_boxes_by_points=1)
        pts, mask = _pad_batch(stuff["points"])
        out = model_car.apply(
            vars_car,
            {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask), "batch_size": 1},
            train=False,
        )
        fbd = {k: np.asarray(v) for k, v in out["final_box_dicts"].items()}
        valid = fbd["pred_valid"][0]
        mo_pts = np.concatenate(
            [fbd["pred_boxes"][0][valid][:, :7], fbd["pred_scores"][0][valid][:, None],
             fbd["pred_labels"][0][valid][:, None].astype(np.float32)], axis=1,
        )
        cls_prob = np.asarray(out["points_cls_prob"])[0]
        flow = np.asarray(out["points_flow3d"])[0]
        send = (cls_prob[:, 0] < 0.3) & mask[0]
        foreground = np.concatenate([pts[0][send][:, :7], cls_prob[send], flow[send]], axis=1)

        mo_pts = propagate_modar(mo_pts, foreground)  # t-1 -> t
        if mo_pts.shape[0]:
            ego_se3_agent = ego_se3_glob @ source.get_pose(token_prev)
            mo_pts[:, :7] = apply_se3(ego_se3_agent, boxes=mo_pts[:, :7])
            all_modar.append(mo_pts)

    # ---- ego: raw cloud + modar -> collab model
    ego_stuff = get_pseudo_sweeps_of_1lidar(source, ego_token_now, 10, ("car",),
                                            threshold_boxes_by_points=1)
    pts13 = np.zeros((ego_stuff["points"].shape[0], 13), np.float32)
    pts13[:, :5] = ego_stuff["points"][:, :5]
    pts13[:, -2:] = ego_stuff["points"][:, -2:]
    if all_modar:
        modar = np.concatenate(all_modar)
        m13 = np.zeros((modar.shape[0], 13), np.float32)
        m13[:, :3] = modar[:, :3]
        m13[:, 5:11] = modar[:, 3:]
        m13[:, -2] = 10
        m13[:, -1] = -1
        pts13 = np.concatenate([pts13, m13])
    pts, mask = _pad_batch(pts13)
    out = model_ego.apply(
        vars_ego,
        {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask), "batch_size": 1},
        train=False,
    )
    fbd = {k: np.asarray(v) for k, v in out["final_box_dicts"].items()}
    valid = fbd["pred_valid"][0]
    det = fbd["pred_boxes"][0][valid]

    # ---- render BEV
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 9))
    raw = pts13[pts13[:, -1] != -1] if all_modar else pts13
    ax.scatter(pts13[:, 0], pts13[:, 1], s=0.3, c="#64748B", label="ego points")
    if all_modar:
        ax.scatter(modar[:, 0], modar[:, 1], s=28, c="#D97706", marker="^", label="MoDAR (from agents)")
    frame = source.get_frame(ego_token_now, classes_of_interest=("car",), threshold_boxes_by_points=1)
    for b in frame["boxes"]:
        ax.add_patch(plt.Rectangle((b[0] - b[3] / 2, b[1] - b[4] / 2), b[3], b[4],
                                   angle=np.degrees(b[6]), rotation_point="center",
                                   fill=False, color="#059669", lw=1.2))
    for b in det[:40]:
        ax.add_patch(plt.Rectangle((b[0] - b[3] / 2, b[1] - b[4] / 2), b[3], b[4],
                                   angle=np.degrees(b[6]), rotation_point="center",
                                   fill=False, color="#DC2626", lw=1.0, ls="--"))
    ax.set_xlim(-60, 60); ax.set_ylim(-60, 60); ax.set_aspect(1)
    ax.legend(loc="upper right")
    ax.set_title("online collaborative inference (green=GT, red=collab detections)")
    fig.savefig(out_png, dpi=110, bbox_inches="tight")
    print(f"wrote {out_png}: {det.shape[0]} detections, {len(all_modar)} agents contributed")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="collab_demo.png")
    p.add_argument("--agent_ckpt", default=None)
    p.add_argument("--ego_ckpt", default=None)
    args = p.parse_args()
    main(args.out, args.agent_ckpt, args.ego_ckpt)
