"""MPPNet temporal stack at test-config scale.

Covers (vs /root/reference/pcdet/models/):
  * trajectory generation: velocity propagation + IoU matching across frames
    (roi_heads/mppnet_head.py:635-659);
  * fixed-capacity per-frame point cropping (:470-549);
  * the full MPPNet head E2E: eval produces decoded boxes through the generic
    post-processing, train produces a finite loss with gradients on every
    parameter group;
  * the MPPNetE2E rolling memory bank contract (mppnet_memory_bank_e2e.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo


def _model_cfg():
    return CfgDict({
        "NAME": "MPPNet",
        "ROI_HEAD": {
            "NAME": "MPPNetHead",
            "CLASS_AGNOSTIC": True,
            "TRANS_INPUT": 32,
            "USE_TRAJ_EMPTY_MASK": True,
            "AVG_STAGE1_SCORE": True,
            "ROI_GRID_POOL": {"GRID_SIZE": 2, "POOL_RADIUS": [1.6],
                              "NSAMPLE": [8], "MLPS": [[16, 32]]},
            "Transformer": {
                "num_frames": 4, "num_groups": 4, "num_lidar_points": 32,
                "nheads": 2, "enc_layers": 2, "dim_feedforward": 64,
                "hidden_dim": 32, "dropout": 0.0, "pre_norm": False,
                "num_proxy_points": 8,
                "use_mlp_mixer": {"hidden_dim": 8, "grid_size": 2},
            },
            "TARGET_CONFIG": {
                "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 8,
                "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55, "CLS_FG_THRESH": 0.6,
                "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
                "HARD_BG_RATIO": 0.8, "CLS_SCORE_TYPE": "roi_iou",
            },
            "LOSS_CONFIG": {
                "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
                "CORNER_LOSS_REGULARIZATION": True,
                "LOSS_WEIGHTS": {
                    "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                    "rcnn_corner_weight": 1.0,
                    "traj_reg_weight": [1.0, 1.0, 1.0],
                    "code_weights": [1.0] * 7,
                },
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3],
            "SCORE_THRESH": 0.0,
            "EVAL_METRIC": "nuscenes",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 16,
                           "NMS_POST_MAXSIZE": 8},
        },
    })


def _info():
    return DatasetInfo(
        class_names=["car"], num_point_features=5,
        point_cloud_range=(-20.0, -20.0, -4.0, 20.0, 20.0, 2.0),
        voxel_size=(0.2, 0.2, 6.0), grid_size=(200, 200, 1))


def _batch(rng, b=1, t=4, r=6, n=512):
    """Cars at known positions; proposals jittered around them per frame,
    with per-frame backward motion (frame i = t - i*0.1s)."""
    gt = np.zeros((b, 3, 8), np.float32)
    centers = np.array([[4.0, 2.0, -0.5], [-6.0, -3.0, -0.6], [8.0, -8.0, -0.4]])
    vel = np.array([[2.0, 0.0], [0.0, 1.5], [-1.0, 1.0]])
    gt[:, :, :3] = centers
    gt[:, :, 3:6] = [4.2, 1.8, 1.6]
    gt[:, :, 7] = 1.0

    props = np.zeros((b, t, r, 9), np.float32)
    scores = np.zeros((b, t, r), np.float32)
    for i in range(t):
        for j in range(3):
            c = centers[j, :2] - vel[j] * 0.1 * i  # position at frame i (past)
            props[:, i, j, 0:2] = c + rng.normal(0, 0.1, 2)
            props[:, i, j, 2] = centers[j, 2]
            props[:, i, j, 3:6] = [4.3, 1.9, 1.6]
            props[:, i, j, 7:9] = vel[j] * 0.1  # per-0.1s displacement
            scores[:, i, j] = 0.9
        # distractor proposals far away
        props[:, i, 3:, 0:2] = rng.uniform(-18, 18, (r - 3, 2))
        props[:, i, 3:, 3:6] = [4.0, 1.8, 1.6]
        scores[:, i, 3:] = 0.2

    # points on each car at each frame's position, stamped with the frame time
    pts = []
    for i in range(t):
        for j in range(3):
            c = np.concatenate([centers[j, :2] - vel[j] * 0.1 * i, centers[j, 2:3]])
            p = c[None] + rng.uniform(-0.8, 0.8, (n // (t * 3), 3))
            stamped = np.concatenate(
                [p, rng.uniform(0, 1, (p.shape[0], 1)),
                 np.full((p.shape[0], 1), i * 0.1)], axis=1)
            pts.append(stamped)
    points = np.concatenate(pts)[None].astype(np.float32)

    return {
        "batch_size": b,
        "points": jnp.asarray(points),
        "points_mask": jnp.ones(points.shape[:2], bool),
        "roi_boxes": jnp.asarray(props),
        "roi_scores": jnp.asarray(scores),
        "roi_labels": jnp.ones((b, r), jnp.int32),
        "gt_boxes": jnp.asarray(gt),
    }


class TestTrajectoryGeneration:
    def test_matches_and_propagates(self):
        from pcp_tpu.models.roi_heads.mppnet_head import generate_trajectory

        rng = np.random.default_rng(0)
        batch = _batch(rng)
        traj, valid = generate_trajectory(np.asarray(batch["roi_boxes"]), 4)
        traj, valid = np.asarray(traj), np.asarray(valid)
        # the 3 true cars keep matching across all frames
        assert valid[0, :, :3].all()
        # matched trajectory rows equal the per-frame proposals
        np.testing.assert_allclose(
            traj[0, 2, :3], np.asarray(batch["roi_boxes"])[0, 2, :3], atol=1e-5)

    def test_unmatched_falls_back_to_propagation(self):
        from pcp_tpu.models.roi_heads.mppnet_head import generate_trajectory

        props = np.zeros((1, 2, 2, 9), np.float32)
        props[0, 0, 0] = [0, 0, 0, 4, 2, 1.6, 0, 1.0, 0.5]
        props[0, 1, 0] = [15, 15, 0, 4, 2, 1.6, 0, 0, 0]  # no overlap at frame 1
        traj, valid = generate_trajectory(props, 2)
        # frame-1 row = frame-0 row advanced by (vx, vy)
        np.testing.assert_allclose(np.asarray(traj)[0, 1, 0, :2], [1.0, 0.5], atol=1e-5)
        assert not bool(np.asarray(valid)[0, 1, 0])


class TestCrop:
    def test_crop_respects_time_and_radius(self):
        from pcp_tpu.models.roi_heads.mppnet_head import crop_frame_points

        rng = np.random.default_rng(1)
        batch = _batch(rng)
        traj = np.asarray(batch["roi_boxes"])
        src = np.asarray(crop_frame_points(np.asarray(batch["points"])[..., :5],
                                           jnp.asarray(traj), 16))
        b, r = 1, traj.shape[2]
        assert src.shape == (b, r, 4 * 16, 5)
        # frame-0 block of roi 0 contains only time-0 points near car 0
        block = src[0, 0, :16]
        got = block[np.any(block != 0, axis=1)]
        assert got.shape[0] > 0
        assert np.all(np.abs(got[:, -1] - 0.0) < 1e-4)
        assert np.all(np.linalg.norm(got[:, :2] - np.array([4.0, 2.0]), axis=1) < 3.0)


class TestMPPNetE2EModel:
    def test_eval_and_train(self):
        rng = np.random.default_rng(2)
        batch = _batch(rng)
        model = build_network(_model_cfg(), num_class=1, dataset_info=_info())
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            batch, train=True)

        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape == (1, 8, 7)
        assert bool(jnp.all(jnp.isfinite(boxes)))
        # the three real cars should survive with the highest scores
        scores = np.asarray(out["final_box_dicts"]["pred_scores"][0])
        valid = np.asarray(out["final_box_dicts"]["pred_valid"][0])
        assert valid.sum() >= 3

        def loss_fn(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(1)})
            return o["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # every parameter family receives gradient somewhere
        nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)
        assert nonzero > len(flat) * 0.5


class TestMemoryBank:
    def test_rolls_and_builds(self):
        from pcp_tpu.models.detectors.mppnet import MPPNetMemoryBank

        bank = MPPNetMemoryBank(num_frames=4, num_rois=6, max_points_per_frame=64)
        rng = np.random.default_rng(3)
        for f in range(6):
            props = rng.uniform(-10, 10, (3, 9)).astype(np.float32)
            bank.push(props, np.full(3, 0.8, np.float32), np.ones(3, np.int32),
                      rng.uniform(-10, 10, (40, 4)).astype(np.float32))
        built = bank.build_batch()
        assert built["roi_boxes"].shape == (1, 4, 6, 9)
        assert built["points"].shape == (1, 4 * 64, 5)
        # frame i carries time stamp i*0.1 on its live rows
        t1 = built["points"][0, 64:64 + 40, 4]
        np.testing.assert_allclose(t1, 0.1, atol=1e-6)
        # bank keeps only the newest 4 frames
        assert len(bank._proposals) == 4

    def test_e2e_detector_consumes_bank(self):
        from pcp_tpu.models.detectors.mppnet import MPPNetMemoryBank

        cfg = _model_cfg()
        cfg["NAME"] = "MPPNetE2E"
        model = build_network(cfg, num_class=1, dataset_info=_info())
        bank = MPPNetMemoryBank(num_frames=4, num_rois=6, max_points_per_frame=128)
        rng = np.random.default_rng(4)
        props = np.zeros((3, 9), np.float32)
        props[:, :3] = [[4, 2, -0.5], [-6, -3, -0.6], [8, -8, -0.4]]
        props[:, 3:6] = [4.2, 1.8, 1.6]
        pts = props[rng.integers(0, 3, 100), :3] + rng.uniform(-0.8, 0.8, (100, 3))
        pts = np.concatenate([pts, rng.uniform(0, 1, (100, 1))], axis=1)
        for _ in range(2):
            bank.push(props, np.full(3, 0.9, np.float32), np.ones(3, np.int32),
                      pts.astype(np.float32))
        batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                 for k, v in bank.build_batch().items()}
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert out["final_box_dicts"]["pred_boxes"].shape == (1, 8, 7)
