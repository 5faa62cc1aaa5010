"""Full-model numerical parity vs an independent torch CenterPoint-pillar.

The north-star check (BASELINE.json: detections must match the PyTorch
reference): build the torch stack with pcdet-compatible state-dict keys,
randomize weights AND BN running stats, convert with ``torch_converter``,
and assert the whole pipeline matches end-to-end on a fixed batch —
BEV features, backbone features, head logits (<= 1e-3), decoded boxes, and
the post-NMS surviving box set. Mirrors the surface of
/root/reference/pcdet/models/detectors/centerpoint.py:9-33 (forward) +
detector3d_template.py:391-445 (checkpoint load path).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.utils.torch_converter import convert_centerpoint_state_dict

from torch_ref_model import TorchCenterPointPillar, randomize_bn_stats
from reference_impls import greedy_nms_ref

GRID = 128
PC_RANGE = (-12.8, -12.8, -8.0, 12.8, 12.8, 0.0)
VOXEL = (0.2, 0.2, 8.0)

MODEL_CFG = {
    "NAME": "CenterPoint",
    "VFE": {
        "NAME": "DynPillarVFE",
        "NUM_RAW_POINT_FEATURES": 5,
        "WITH_DISTANCE": False,
        "USE_ABSLOTE_XYZ": True,
        "USE_NORM": True,
        "NUM_FILTERS": [32, 32],
    },
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2],
        "LAYER_STRIDES": [2, 2],
        "NUM_FILTERS": [32, 64],
        "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [64, 64],
    },
    "DENSE_HEAD": {
        "NAME": "CenterHead",
        "CLASS_AGNOSTIC": False,
        "CLASS_NAMES_EACH_HEAD": [["car"]],
        "SHARED_CONV_CHANNEL": 32,
        "USE_BIAS_BEFORE_NORM": True,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": {
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        },
        "TARGET_ASSIGNER_CONFIG": {
            "FEATURE_MAP_STRIDE": 2,
            "NUM_MAX_OBJS": 100,
            "GAUSSIAN_OVERLAP": 0.1,
            "MIN_RADIUS": 2,
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0,
                "loc_weight": 2.0,
                "code_weights": [1.0] * 8,
            }
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-15.0, -15.0, -10.0, 15.0, 15.0, 10.0],
            "MAX_OBJ_PER_SAMPLE": 100,
            "NMS_CONFIG": {
                "NMS_TYPE": "nms_gpu",
                "NMS_THRESH": 0.2,
                "NMS_PRE_MAXSIZE": 100,
                "NMS_POST_MAXSIZE": 30,
            },
        },
    },
}


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(7)
    torch.manual_seed(7)
    cfg = CfgDict(MODEL_CFG)

    tmodel = TorchCenterPointPillar(
        cfg, grid_size=(GRID, GRID, 1), pc_range=PC_RANGE, voxel_size=VOXEL, num_raw=5
    )
    tmodel.eval()
    with torch.no_grad():
        randomize_bn_stats(tmodel, rng)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_centerpoint_state_dict(sd, cfg)

    info = DatasetInfo(
        class_names=("car",), num_point_features=5, point_cloud_range=PC_RANGE,
        voxel_size=VOXEL, grid_size=(GRID, GRID, 1),
    )
    jmodel = build_network(cfg, num_class=1, dataset_info=info)

    # clustered points, all strictly in range
    b, n = 2, 2048
    centers = rng.uniform(-10, 10, size=(b, 24, 2))
    ci = rng.integers(0, 24, size=n)
    pts = np.zeros((b, n, 5), dtype=np.float32)
    pts[..., 0:2] = np.clip(
        centers[:, ci, :] + rng.normal(0, 1.5, (b, n, 2)), -12.7, 12.69
    )
    pts[..., 2] = rng.uniform(-3, -0.5, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    pts[..., 4] = 0.0
    return tmodel, jmodel, variables, pts


class TestFullModelParity:
    def test_bev_backbone_head_and_detections(self, parity_setup):
        tmodel, jmodel, variables, pts = parity_setup
        b = pts.shape[0]

        with torch.no_grad():
            tpreds, tbev, tfeat = tmodel([torch.tensor(p) for p in pts])

        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.ones(pts.shape[:2], bool),
            "batch_size": b,
        }
        # use the converted variables directly; init only to validate structure
        init_vars = jmodel.init(jax.random.PRNGKey(0), batch, train=False)
        conv_flat = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.shape, variables["params"])
        )
        # every init param must be covered by the converter
        init_paths = {
            "/".join(str(k.key) for k in p)
            for p, _ in jax.tree_util.tree_leaves_with_path(init_vars["params"])
        }
        conv_paths = {
            "/".join(str(k.key) for k in p)
            for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])
        }
        assert init_paths == conv_paths, (
            init_paths.symmetric_difference(conv_paths)
        )

        out = jmodel.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            batch,
            train=False,
        )

        # 1) dense BEV after VFE: torch (B, C, ny, nx) vs ours (B, ny*nx, C)
        jbev = np.asarray(out["spatial_features"])  # (B, ny, nx, C)
        tbev_np = tbev.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(jbev, tbev_np, atol=2e-4, rtol=1e-4)

        # 2) backbone output
        jfeat = np.asarray(out["spatial_features_2d"])
        tfeat_np = tfeat.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(jfeat, tfeat_np, atol=2e-3, rtol=1e-3)

        # 3) head logits
        jhead = out["head_preds"][0]
        for name in ("hm", "center", "center_z", "dim", "rot"):
            tv = tpreds[0][name].numpy().transpose(0, 2, 3, 1)
            jv = np.asarray(jhead[name])
            np.testing.assert_allclose(jv, tv, atol=3e-3, rtol=1e-3, err_msg=name)

        # 4) decoded + NMS'd detections: decode torch outputs independently
        # (numpy, float64) and run the greedy reference NMS; compare the
        # surviving box set against our final_box_dicts
        hm = 1 / (1 + np.exp(-tpreds[0]["hm"].numpy()))  # (B, 1, H, W)
        fbd = {k: np.asarray(v) for k, v in out["final_box_dicts"].items()}
        pp = MODEL_CFG["DENSE_HEAD"]["POST_PROCESSING"]
        for i in range(b):
            scores = hm[i, 0].reshape(-1)
            order = np.argsort(-scores)[: pp["NMS_CONFIG"]["NMS_PRE_MAXSIZE"]]
            ys, xs = np.unravel_index(order, hm.shape[2:])
            stride = MODEL_CFG["DENSE_HEAD"]["TARGET_ASSIGNER_CONFIG"]["FEATURE_MAP_STRIDE"]
            center = tpreds[0]["center"].numpy()[i].transpose(1, 2, 0)
            center_z = tpreds[0]["center_z"].numpy()[i].transpose(1, 2, 0)
            dim = np.exp(tpreds[0]["dim"].numpy()[i].transpose(1, 2, 0))
            rot = tpreds[0]["rot"].numpy()[i].transpose(1, 2, 0)
            xg = (xs + center[ys, xs, 0]) * stride * VOXEL[0] + PC_RANGE[0]
            yg = (ys + center[ys, xs, 1]) * stride * VOXEL[1] + PC_RANGE[1]
            zg = center_z[ys, xs, 0]
            yaw = np.arctan2(rot[ys, xs, 1], rot[ys, xs, 0])
            boxes = np.stack([xg, yg, zg, dim[ys, xs, 0], dim[ys, xs, 1], dim[ys, xs, 2], yaw], 1)
            sc = scores[order]
            keep_mask = sc > pp["SCORE_THRESH"]
            boxes, sc = boxes[keep_mask], sc[keep_mask]
            want_keep = greedy_nms_ref(boxes.astype(np.float64), sc, pp["NMS_CONFIG"]["NMS_THRESH"])
            want_keep = want_keep[: pp["NMS_CONFIG"]["NMS_POST_MAXSIZE"]]
            want_boxes, want_sc = boxes[want_keep], sc[want_keep]

            got_valid = fbd["pred_valid"][i]
            got_boxes = fbd["pred_boxes"][i][got_valid]
            got_sc = fbd["pred_scores"][i][got_valid]

            # candidates whose scores straddle the top-K / score-threshold
            # boundary can differ between float implementations by 1e-6 and
            # flip membership; survivors strictly above the boundary have
            # fates determined only by higher-scoring (stable) boxes, so the
            # comparison is exact there.
            s_cut = np.sort(scores)[-pp["NMS_CONFIG"]["NMS_PRE_MAXSIZE"]]
            margin = max(s_cut, pp["SCORE_THRESH"]) + 5e-4
            wm, gm = want_sc > margin, got_sc > margin
            assert wm.sum() == gm.sum(), (want_sc[wm], got_sc[gm])
            assert wm.sum() >= 3, "vacuous comparison — raise candidate spread"
            # nearest-neighbor 1-1 set match (near-equal scores may swap ranks)
            wo, go = want_boxes[wm], got_boxes[gm]
            dist = np.linalg.norm(go[:, None, :3] - wo[None, :, :3], axis=-1)
            match = np.argmin(dist, axis=1)
            assert len(set(match.tolist())) == len(match), "matching not 1-1"
            np.testing.assert_allclose(go, wo[match], atol=5e-3, rtol=2e-3)
            np.testing.assert_allclose(
                np.sort(got_sc[gm]), np.sort(want_sc[wm]), atol=1e-4
            )
