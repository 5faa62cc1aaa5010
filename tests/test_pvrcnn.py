"""PV-RCNN stack tests: VSA keypoint extraction + PVRCNNHead grid pooling,
end-to-end on a tiny voxel world (structure of
/root/reference/tools/cfgs/kitti_models/pv_rcnn.yaml, scaled down)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo


PVRCNN_CFG = {
    "NAME": "PVRCNN",
    "VFE": {"NAME": "MeanVFE", "NUM_POINT_FEATURES": 4, "MAX_VOXELS": 512},
    "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    },
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle",
        "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "car", "anchor_sizes": [[3.9, 1.6, 1.56]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": 8,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45,
        }],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder",
        },
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    },
    "PFE": {
        "NAME": "VoxelSetAbstraction",
        "POINT_SOURCE": "raw_points",
        "NUM_KEYPOINTS": 64,
        "NUM_OUTPUT_FEATURES": 32,
        "SAMPLE_METHOD": "FPS",
        "FEATURES_SOURCE": ["bev", "x_conv3", "x_conv4", "raw_points"],
        "SA_LAYER": {
            "raw_points": {"MLPS": [[8, 8], [8, 8]],
                           "POOL_RADIUS": [0.4, 0.8], "NSAMPLE": [8, 8]},
            "x_conv3": {"DOWNSAMPLE_FACTOR": 4, "MLPS": [[16, 16], [16, 16]],
                        "POOL_RADIUS": [1.2, 2.4], "NSAMPLE": [8, 8]},
            "x_conv4": {"DOWNSAMPLE_FACTOR": 8, "MLPS": [[16, 16], [16, 16]],
                        "POOL_RADIUS": [2.4, 4.8], "NSAMPLE": [8, 8]},
        },
    },
    "POINT_HEAD": {
        "NAME": "PointHeadSimple",
        "CLS_FC": [16],
        "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_REG": "smooth-l1",
                        "LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    },
    "ROI_HEAD": {
        "NAME": "PVRCNNHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32],
        "CLS_FC": [32], "REG_FC": [32], "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {
            "GRID_SIZE": 3,
            "MLPS": [[8, 8], [8, 8]],
            "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
            "POOL_METHOD": "max_pool",
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "roi_iou",
            "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7},
        },
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1, "OUTPUT_RAW_SCORE": False,
        "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
    },
}


@pytest.fixture(scope="module")
def tiny_pvrcnn():
    info = DatasetInfo(
        class_names=("car",), num_point_features=4,
        point_cloud_range=(-6.4, -6.4, -8.0, 6.4, 6.4, 0.0),
        voxel_size=(0.1, 0.1, 0.2), grid_size=(128, 128, 40))
    cfg = CfgDict(PVRCNN_CFG)
    model = build_network(cfg, num_class=1, dataset_info=info)
    rng = np.random.default_rng(0)
    b, n = 1, 512
    pts = rng.uniform(-6, 6, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
    gt = np.zeros((b, 3, 8), np.float32)
    gt[:, 0] = [0, 0, -2, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [3, -2, -2, 3.9, 1.6, 1.56, -0.8, 1]
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "batch_size": b,
    }
    return model, batch


class TestPVRCNNE2E:
    def test_eval_forward(self, tiny_pvrcnn):
        model, batch = tiny_pvrcnn
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape == (1, 16, 7)
        assert bool(jnp.all(jnp.isfinite(boxes)))
        # VSA outputs exist with the configured width
        assert out["point_features"].shape == (1, 64, 32)

    def test_train_loss_and_grads(self, tiny_pvrcnn):
        model, batch = tiny_pvrcnn
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(3),
             "dropout": jax.random.PRNGKey(4)},
            batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
            return out["loss"], out["tb_dict"]

        (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        # all three stages contribute
        assert "rcnn_loss" in tb and "point_loss_cls" in tb
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
