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


def test_separate_multihead_e2e():
    """SEPARATE_MULTIHEAD: per-head class logits scattered into the full
    class layout (reference anchor_head_multi.py:159,190,210-216) — layout,
    eval labels, and training all work; other heads' columns are ~-20."""
    import copy

    cfg = copy.deepcopy(CFG)
    cfg["DENSE_HEAD"]["SEPARATE_MULTIHEAD"] = True
    info = DatasetInfo(
        class_names=("car", "pedestrian"), num_point_features=5,
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1))
    model = build_network(CfgDict(cfg), num_class=2, dataset_info=info)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-12, 12, (1, 256, 5)).astype(np.float32)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[:, 0] = [0, 0, -1, 4.2, 1.8, 1.6, 0.2, 1]
    gt[:, 1] = [4, 4, -1, 0.8, 0.6, 1.7, 0.0, 2]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((1, 256), bool),
             "gt_boxes": jnp.asarray(gt), "batch_size": 1}
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    cls = np.asarray(out["batch_cls_preds"][0])  # (NA, 2)
    # flat anchor layout is (y, x, a) with a = [car_rot0, car_rot1, ped_rot0,
    # ped_rot1]: car-head rows must have the pedestrian column ~ -20 and v.v.
    per_loc = cls.reshape(-1, 4, 2)
    assert np.allclose(per_loc[:, :2, 1], -20.0, atol=1e-4)
    assert np.allclose(per_loc[:, 2:, 0], -20.0, atol=1e-4)
    assert not np.allclose(per_loc[:, :2, 0], -20.0)

    def loss_fn(p):
        o, _ = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})},
                           batch, train=True, mutable=["batch_stats"])
        return o["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))


def test_atss_assigner():
    """ATSSTargetAssigner: a GT with nearby same-size anchors gets positive
    labels; force-matching guarantees >= 1 positive per valid GT
    (reference atss_target_assigner.py:76-141)."""
    import copy

    cfg = copy.deepcopy(CFG)
    cfg["DENSE_HEAD"]["TARGET_ASSIGNER_CONFIG"]["NAME"] = "ATSSTargetAssigner"
    cfg["DENSE_HEAD"]["TARGET_ASSIGNER_CONFIG"]["TOPK"] = 9
    info = DatasetInfo(
        class_names=("car", "pedestrian"), num_point_features=5,
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1))
    model = build_network(CfgDict(cfg), num_class=2, dataset_info=info)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-12, 12, (1, 256, 5)).astype(np.float32)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[:, 0] = [0, 0, -1, 4.2, 1.8, 1.6, 0.0, 1]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((1, 256), bool),
             "gt_boxes": jnp.asarray(gt), "batch_size": 1}
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)

    head = None
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    labels = np.asarray(out["head_targets"]["box_cls_labels"][0])
    assert (labels == 1).sum() >= 1  # the car GT got at least its forced anchor
    assert (labels == 2).sum() == 0  # no pedestrian GT -> no pedestrian labels
    assert np.isfinite(float(out["loss"]))


def test_circle_nms():
    """circle_nms keeps the higher-scoring of two near-identical centers and
    keeps far-apart boxes (CenterPoint circle_nms semantics)."""
    from pcp_tpu.ops.nms import nms_circle

    boxes = jnp.asarray(np.array([
        [0.0, 0.0, 0, 4, 2, 1.6, 0],
        [0.5, 0.0, 0, 4, 2, 1.6, 0],   # 0.25 m^2 away from box 0
        [10.0, 0.0, 0, 4, 2, 1.6, 0],
    ], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, count = nms_circle(boxes, scores, jnp.ones(3, bool), dist_thresh=1.0,
                             post_max_size=4)
    kept = set(np.asarray(keep)[np.asarray(keep) >= 0].tolist())
    assert kept == {0, 2}
    assert int(count) == 2


def test_object_discoverer():
    """ObjectDiscoverer host model: metadata disco_boxes -> final_box_dicts
    (reference obj_discoverer.py)."""
    from pcp_tpu.models import build_network as bn

    cfg = CfgDict({"NAME": "ObjectDiscoverer",
                   "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3],
                                       "MAX_OBJ_PER_SAMPLE": 8,
                                       "EVAL_METRIC": "nuscenes"}})
    info = DatasetInfo(
        class_names=("car",), num_point_features=5,
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1))
    model = bn(cfg, num_class=1, dataset_info=info)
    disco = np.zeros((3, 10), np.float32)
    disco[:, :7] = [[1, 2, -1, 4, 2, 1.6, 0.1]] * 3
    disco[:, -1] = 0.0  # class idx from 0
    batch = {"batch_size": 1, "metadata": [{"disco_boxes": disco}]}
    out = model(batch, train=False)
    fbd = out["final_box_dicts"]
    assert fbd["pred_boxes"].shape == (1, 8, 7)
    assert fbd["pred_valid"][0].sum() == 3
    assert (fbd["pred_labels"][0][:3] == 1).all()
