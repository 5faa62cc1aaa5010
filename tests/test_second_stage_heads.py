"""SECONDNetIoU (BEV rotated-grid IoU head) and VoxelRCNN (voxel-center grid
pooling head) tiny end-to-end builds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo

ANCHOR_HEAD = {
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
}

BASE = {
    "VFE": {"NAME": "MeanVFE", "NUM_POINT_FEATURES": 4, "MAX_VOXELS": 512},
    "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    },
    "DENSE_HEAD": ANCHOR_HEAD,
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1, "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64,
                       "NMS_POST_MAXSIZE": 16},
    },
}

ROI_NMS = {
    "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
              "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
    "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
             "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.7},
}
ROI_TARGETS = {
    "BOX_CODER": "ResidualCoder",
    "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
    "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "roi_iou",
    "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
    "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
}


def _info_and_batch():
    info = DatasetInfo(
        class_names=("car",), num_point_features=4,
        point_cloud_range=(-6.4, -6.4, -8.0, 6.4, 6.4, 0.0),
        voxel_size=(0.1, 0.1, 0.2), grid_size=(128, 128, 40))
    rng = np.random.default_rng(0)
    b, n = 1, 512
    pts = rng.uniform(-6, 6, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
    gt = np.zeros((b, 3, 8), np.float32)
    gt[:, 0] = [0, 0, -2, 3.9, 1.6, 1.56, 0.3, 1]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
             "gt_boxes": jnp.asarray(gt), "batch_size": b}
    return info, batch


def _run_both_modes(cfg_dict, expected_post=16):
    info, batch = _info_and_batch()
    model = build_network(CfgDict(cfg_dict), num_class=1, dataset_info=info)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, train=True)
    out = model.apply(variables, batch, train=False)
    boxes = out["final_box_dicts"]["pred_boxes"]
    assert boxes.shape[:2] == (1, expected_post)
    assert bool(jnp.all(jnp.isfinite(boxes)))

    def loss_fn(p):
        o, _ = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})},
                           batch, train=True, mutable=["batch_stats"],
                           rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)})
        return o["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads))


def test_second_net_iou_e2e():
    cfg = dict(BASE)
    cfg["NAME"] = "SECONDNetIoU"
    cfg["ROI_HEAD"] = {
        "NAME": "SECONDHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "IOU_FC": [32], "DP_RATIO": 0.3,
        "ROI_GRID_POOL": {"GRID_SIZE": 7, "IN_CHANNEL": 64, "DOWNSAMPLE_RATIO": 8},
        "NMS_CONFIG": ROI_NMS,
        "TARGET_CONFIG": ROI_TARGETS,
        "LOSS_CONFIG": {"IOU_LOSS": "BinaryCrossEntropy"},
    }
    cfg["POST_PROCESSING"] = dict(BASE["POST_PROCESSING"])
    cfg["POST_PROCESSING"]["NMS_CONFIG"] = {
        **BASE["POST_PROCESSING"]["NMS_CONFIG"], "SCORE_TYPE": "weighted_iou_cls",
        "SCORE_WEIGHTS": {"iou": 0.5, "cls": 0.5}}
    _run_both_modes(cfg)


def test_voxel_rcnn_e2e():
    cfg = dict(BASE)
    cfg["NAME"] = "VoxelRCNN"
    cfg["ROI_HEAD"] = {
        "NAME": "VoxelRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [32], "REG_FC": [32], "DP_RATIO": 0.3,
        "ROI_GRID_POOL": {
            "GRID_SIZE": 3,
            "FEATURES_SOURCE": ["x_conv3", "x_conv4"],
            "POOL_LAYERS": {
                "x_conv3": {"DOWNSAMPLE_FACTOR": 4, "MLPS": [[16, 16]],
                            "POOL_RADIUS": [1.2], "NSAMPLE": [8]},
                "x_conv4": {"DOWNSAMPLE_FACTOR": 8, "MLPS": [[16, 16]],
                            "POOL_RADIUS": [2.4], "NSAMPLE": [8]},
            },
        },
        "NMS_CONFIG": ROI_NMS,
        "TARGET_CONFIG": ROI_TARGETS,
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7},
        },
    }
    _run_both_modes(cfg)
