"""AnchorHeadMulti: grouped towers produce the same layout as the single
head and train end-to-end in a PointPillar detector."""
import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo

CFG = {
    "NAME": "PointPillar",
    "VFE": {"NAME": "DynPillarVFE", "NUM_RAW_POINT_FEATURES": 5,
            "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
            "NUM_FILTERS": [16, 16]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [2], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadMulti",
        "CLASS_AGNOSTIC": False,
        "SHARED_CONV_NUM_FILTER": 16,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "RPN_HEAD_CFGS": [
            {"HEAD_CLS_NAME": ["car"]},
            {"HEAD_CLS_NAME": ["pedestrian"]},
        ],
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "car", "anchor_sizes": [[4.2, 1.8, 1.6]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.55, "unmatched_threshold": 0.4},
            {"class_name": "pedestrian", "anchor_sizes": [[0.8, 0.6, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.0],
             "align_center": False, "feature_map_stride": 2,
             "matched_threshold": 0.5, "unmatched_threshold": 0.35},
        ],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder"},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
        "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 128,
                       "NMS_POST_MAXSIZE": 32},
    },
}


def test_anchor_head_multi_e2e():
    info = DatasetInfo(
        class_names=("car", "pedestrian"), num_point_features=5,
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1))
    model = build_network(CfgDict(CFG), num_class=2, dataset_info=info)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-12, 12, (2, 256, 5)).astype(np.float32)
    gt = np.zeros((2, 4, 8), np.float32)
    gt[:, 0] = [0, 0, -1, 4.2, 1.8, 1.6, 0.2, 1]
    gt[:, 1] = [4, 4, -1, 0.8, 0.6, 1.7, 0.0, 2]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((2, 256), bool),
             "gt_boxes": jnp.asarray(gt), "batch_size": 2}
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    fbd = out["final_box_dicts"]
    assert fbd["pred_boxes"].shape == (2, 32, 7)
    # flat anchor count matches the single-head layout: H/2 * W/2 * 4 anchors
    assert out["batch_cls_preds"].shape == (2, 64 * 64 * 4, 2)

    def loss_fn(p):
        o, _ = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})},
                           batch, train=True, mutable=["batch_stats"])
        return o["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))) > 0
