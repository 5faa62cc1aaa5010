"""PillarNet: pillar 2D backbone (masked dense == submanifold) +
BaseBEVBackboneV1 + CenterHead, tiny E2E."""
import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo

CFG = {
    "NAME": "PillarNet",
    "VFE": {"NAME": "DynPillarVFE", "NUM_RAW_POINT_FEATURES": 4,
            "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
            "NUM_FILTERS": [32]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
    "BACKBONE_3D": {"NAME": "PillarRes18BackBone8x"},
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackboneV1",
        "LAYER_NUMS": [2, 2], "NUM_FILTERS": [64, 64],
        "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [32, 32],
    },
    "DENSE_HEAD": {
        "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
        "CLASS_NAMES_EACH_HEAD": [["car"]],
        "SHARED_CONV_CHANNEL": 32, "USE_BIAS_BEFORE_NORM": True,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": {"center": {"out_channels": 2, "num_conv": 2},
                          "center_z": {"out_channels": 1, "num_conv": 2},
                          "dim": {"out_channels": 3, "num_conv": 2},
                          "rot": {"out_channels": 2, "num_conv": 2}},
        },
        "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 8, "NUM_MAX_OBJS": 50,
                                   "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 0.25,
                                         "code_weights": [1.0] * 8}},
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-20, -20, -10, 20, 20, 10],
            "MAX_OBJ_PER_SAMPLE": 50,
            "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.2,
                           "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
        },
    },
    "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                        "EVAL_METRIC": "kitti"},
}


def test_pillarnet_e2e():
    info = DatasetInfo(
        class_names=("car",), num_point_features=4,
        point_cloud_range=(-12.8, -12.8, -3.0, 12.8, 12.8, 1.0),
        voxel_size=(0.2, 0.2, 4.0), grid_size=(128, 128, 1))
    model = build_network(CfgDict(CFG), num_class=1, dataset_info=info)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-12, 12, (1, 512, 4)).astype(np.float32)
    gt = np.zeros((1, 3, 8), np.float32)
    gt[:, 0] = [0, 0, -1, 4.2, 1.8, 1.6, 0.3, 1]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((1, 512), bool),
             "gt_boxes": jnp.asarray(gt), "batch_size": 1}
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    fbd = out["final_box_dicts"]
    assert fbd["pred_boxes"].shape[0] == 1
    assert bool(jnp.all(jnp.isfinite(fbd["pred_boxes"])))
    # multi-scale 2D features at strides 8 and 16
    assert out["multi_scale_2d_features"]["x_conv4"].shape[1] == 16
    assert out["multi_scale_2d_features"]["x_conv5"].shape[1] == 8

    def loss_fn(p):
        o, _ = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})},
                           batch, train=True, mutable=["batch_stats"])
        return o["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))) > 0
