"""PointRCNN stack tests: roipoint pooling, ROI target sampling, and a tiny
end-to-end PointRCNN (PointNet2MSG + PointHeadBox + PointRCNNHead)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.models.roi_heads.roi_head_template import sample_rois_for_rcnn
from pcp_tpu.ops.roipoint_pool3d import roipoint_pool3d


class TestRoiPointPool3d:
    def test_first_k_and_wrap(self):
        pts = np.zeros((1, 10, 3), np.float32)
        pts[0, :, 0] = np.arange(10)  # along x
        feats = np.arange(10, dtype=np.float32).reshape(1, 10, 1)
        rois = np.array([[[2.0, 0, 0, 3.0, 2.0, 2.0, 0.0]]], np.float32)  # covers x in [0.5, 3.5]
        pooled, empty = roipoint_pool3d(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(rois), num_sampled_points=6)
        pooled, empty = np.asarray(pooled), np.asarray(empty)
        assert not empty[0, 0]
        # points 1, 2, 3 are inside; slots wrap 1,2,3,1,2,3
        np.testing.assert_allclose(pooled[0, 0, :, 3], [1, 2, 3, 1, 2, 3])

    def test_empty_roi_zeroed(self):
        pts = np.random.default_rng(0).uniform(-1, 1, (1, 20, 3)).astype(np.float32)
        feats = np.ones((1, 20, 2), np.float32)
        rois = np.array([[[50.0, 50, 50, 1, 1, 1, 0.3]]], np.float32)
        pooled, empty = roipoint_pool3d(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(rois), num_sampled_points=4)
        assert np.asarray(empty)[0, 0]
        np.testing.assert_allclose(np.asarray(pooled)[0, 0], 0.0)

    def test_extra_width_enlarges(self):
        pts = np.array([[[1.4, 0, 0]]], np.float32)  # just outside dx=2 box
        feats = np.zeros((1, 1, 1), np.float32)
        rois = np.array([[[0.0, 0, 0, 2.0, 2.0, 2.0, 0.0]]], np.float32)
        _, empty0 = roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(rois), 2)
        _, empty1 = roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(rois), 2,
                                    pool_extra_width=(1.0, 1.0, 1.0))
        assert np.asarray(empty0)[0, 0] and not np.asarray(empty1)[0, 0]


SAMPLER_CFG = {
    "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
    "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
    "HARD_BG_RATIO": 0.8, "CLS_SCORE_TYPE": "cls",
}


class TestProposalTargetSampling:
    def _run(self, rois, gt):
        r = jnp.asarray(rois, jnp.float32)
        g = jnp.asarray(gt, jnp.float32)
        return jax.tree_util.tree_map(np.asarray, sample_rois_for_rcnn(
            jax.random.PRNGKey(0), r,
            jnp.ones(r.shape[0]), jnp.ones(r.shape[0], jnp.int32), g, SAMPLER_CFG))

    def test_fg_bg_mix(self):
        gt = np.zeros((3, 8), np.float32)
        gt[0] = [0, 0, 0, 4, 2, 1.6, 0, 1]
        rois = np.zeros((30, 7), np.float32)
        rois[0] = [0.1, 0, 0, 4, 2, 1.6, 0]       # near-perfect -> fg
        rois[1] = [0.05, 0.05, 0, 4, 2, 1.6, 0]   # fg
        rois[2] = [1.5, 0.8, 0, 4, 2, 1.6, 0.4]   # partial -> hard bg-ish
        # rest: zero rois -> iou 0 -> easy bg
        out = self._run(rois, gt)
        assert out["rois"].shape == (16, 7)
        fg_slots = out["roi_ious"] >= 0.55
        # both fg rois sampled (fg quota is 8, only 2 candidates)
        assert fg_slots.sum() == 2
        # fg slots are assigned the matching gt
        for i in np.where(fg_slots)[0]:
            np.testing.assert_allclose(out["gt_of_rois"][i][:7], gt[0][:7])
        # remaining slots filled with bg
        assert out["roi_sample_valid"].all()

    def test_no_fg_all_bg(self):
        gt = np.zeros((2, 8), np.float32)
        gt[0] = [20, 20, 0, 4, 2, 1.6, 0, 1]
        rois = np.random.default_rng(1).uniform(-5, 5, (20, 7)).astype(np.float32)
        rois[:, 3:6] = 2.0
        out = self._run(rois, gt)
        assert (out["roi_ious"] < 0.55).all()
        assert out["roi_sample_valid"].all()


POINTRCNN_CFG = {
    "NAME": "PointRCNN",
    "BACKBONE_3D": {
        "NAME": "PointNet2MSG",
        "SA_CONFIG": {
            "NPOINTS": [64, 16],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
            "NSAMPLE": [[8, 16], [8, 16]],
            "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
        },
        "FP_MLPS": [[16, 16], [16, 16]],
    },
    "POINT_HEAD": {
        "NAME": "PointHeadBox",
        "CLS_FC": [16],
        "REG_FC": [16],
        "CLASS_AGNOSTIC": False,
        "USE_POINT_FEATURES_BEFORE_FUSION": False,
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {
                "use_mean_size": True,
                "mean_size": [[3.9, 1.6, 1.56]],
            },
        },
        "LOSS_CONFIG": {
            "LOSS_REG": "WeightedSmoothL1Loss",
            "LOSS_WEIGHTS": {"point_cls_weight": 1.0, "point_box_weight": 1.0,
                             "code_weights": [1.0] * 8},
        },
    },
    "ROI_HEAD": {
        "NAME": "PointRCNNHead",
        "CLASS_AGNOSTIC": True,
        "ROI_POINT_POOL": {
            "POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
            "NUM_SAMPLED_POINTS": 32,
            "DEPTH_NORMALIZER": 70.0,
        },
        "XYZ_UP_LAYER": [16, 16],
        "CLS_FC": [16],
        "REG_FC": [16],
        "USE_BN": False,
        "SA_CONFIG": {
            "NPOINTS": [16, 8, -1],
            "RADIUS": [0.5, 1.0, 100.0],
            "NSAMPLE": [8, 8, 8],
            "MLPS": [[16, 16], [16, 16], [16, 16]],
        },
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.85},
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "cls",
            "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy",
            "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7},
        },
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1,
        "OUTPUT_RAW_SCORE": False,
        "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
    },
}


@pytest.fixture(scope="module")
def tiny_pointrcnn():
    info = DatasetInfo(
        class_names=("car",), num_point_features=4,
        point_cloud_range=(-10, -10, -3, 10, 10, 1),
        voxel_size=(0.2, 0.2, 4.0), grid_size=(100, 100, 1))
    from pcp_tpu.config import CfgDict

    cfg = CfgDict(POINTRCNN_CFG)
    model = build_network(cfg, num_class=1, dataset_info=info)
    rng = np.random.default_rng(0)
    b, n = 2, 256
    pts = rng.uniform(-8, 8, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 0, (b, n))
    gt = np.zeros((b, 4, 8), np.float32)
    gt[:, 0] = [0, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [4, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "batch_size": b,
    }
    return model, batch


class TestPointRCNNE2E:
    def test_eval_forward_shapes(self, tiny_pointrcnn):
        model, batch = tiny_pointrcnn
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape == (2, 16, 7)
        assert bool(jnp.all(jnp.isfinite(boxes)))
        assert out["final_box_dicts"]["pred_labels"].max() <= 1

    def test_train_loss_and_grads(self, tiny_pointrcnn):
        model, batch = tiny_pointrcnn
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(7),
             "dropout": jax.random.PRNGKey(4)},
            batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(4)})
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0
