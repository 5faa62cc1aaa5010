"""Full-model torch parity for the ANCHOR path: a pcdet-keyed torch
PointPillar-anchor stack (VFE + BEV backbone + AnchorHeadSingle 1x1 convs)
with random weights converts through torch_converter and must produce the
same pre-NMS decoded predictions as our PointPillar."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from torch_ref_model import TorchBEVBackbone, TorchDynPillarVFE, randomize_bn_stats

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.utils.torch_converter import convert_centerpoint_state_dict

GRID = 64
PC_RANGE = (-6.4, -6.4, -8.0, 6.4, 6.4, 0.0)
VOXEL = (0.2, 0.2, 8.0)

MODEL_CFG = {
    "NAME": "PointPillar",
    "VFE": {"NAME": "DynPillarVFE", "NUM_RAW_POINT_FEATURES": 5,
            "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
            "NUM_FILTERS": [16, 16]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2],
                    "LAYER_STRIDES": [2, 2], "NUM_FILTERS": [16, 32],
                    "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [16, 16]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "car", "anchor_sizes": [[4.2, 1.8, 1.6]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": 2,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45}],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder"},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                         "dir_weight": 0.2,
                                         "code_weights": [1.0] * 7}},
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
        "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 256,
                       "NMS_POST_MAXSIZE": 32},
    },
}


class TorchAnchorHead(nn.Module):
    """pcdet AnchorHeadSingle prediction convs (anchor_head_single.py):
    1x1 conv_cls / conv_box / conv_dir_cls over NCHW features."""

    def __init__(self, cin, num_anchors, num_class, code_size, num_dir_bins):
        super().__init__()
        self.conv_cls = nn.Conv2d(cin, num_anchors * num_class, 1)
        self.conv_box = nn.Conv2d(cin, num_anchors * code_size, 1)
        self.conv_dir_cls = nn.Conv2d(cin, num_anchors * num_dir_bins, 1)
        self.num_class, self.code_size, self.num_dir = num_class, code_size, num_dir_bins

    def forward(self, feat):
        def flat(x, c):
            return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1, c)
        return (flat(self.conv_cls(feat), self.num_class),
                flat(self.conv_box(feat), self.code_size),
                flat(self.conv_dir_cls(feat), self.num_dir))


class TorchPointPillarAnchor(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        vcfg, bcfg = cfg["VFE"], cfg["BACKBONE_2D"]
        self.vfe = TorchDynPillarVFE(5, list(vcfg["NUM_FILTERS"]), VOXEL,
                                     PC_RANGE, (GRID, GRID, 1))
        self.backbone_2d = TorchBEVBackbone(
            list(vcfg["NUM_FILTERS"])[-1], list(bcfg["LAYER_NUMS"]),
            list(bcfg["LAYER_STRIDES"]), list(bcfg["NUM_FILTERS"]),
            list(bcfg["UPSAMPLE_STRIDES"]), list(bcfg["NUM_UPSAMPLE_FILTERS"]))
        self.dense_head = TorchAnchorHead(
            sum(bcfg["NUM_UPSAMPLE_FILTERS"]), 2, 1, 7, 2)

    @torch.no_grad()
    def forward(self, points_list):
        bev = self.vfe(points_list)
        feat = self.backbone_2d(bev)
        return self.dense_head(feat)


def test_anchor_path_parity():
    cfg = CfgDict(MODEL_CFG)
    tmodel = TorchPointPillarAnchor(cfg).eval()
    rng = np.random.default_rng(0)
    randomize_bn_stats(tmodel, rng)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_centerpoint_state_dict(sd, cfg)

    info = DatasetInfo(class_names=("car",), num_point_features=5,
                       point_cloud_range=PC_RANGE, voxel_size=VOXEL,
                       grid_size=(GRID, GRID, 1))
    jmodel = build_network(cfg, num_class=1, dataset_info=info)

    b, n = 2, 1024
    pts = np.zeros((b, n, 5), np.float32)
    pts[..., 0:2] = rng.uniform(-6.3, 6.3, (b, n, 2))
    pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
    pts[..., 3:] = rng.uniform(0, 1, (b, n, 2))

    t_cls, t_box, t_dir = tmodel([torch.from_numpy(p) for p in pts])

    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
             "batch_size": b}
    out = jmodel.apply(variables, batch, train=False)
    j_cls = np.asarray(out["head_preds"]["cls_preds"])
    j_box = np.asarray(out["head_preds"]["box_preds"])
    j_dir = np.asarray(out["head_preds"]["dir_cls_preds"])

    np.testing.assert_allclose(j_cls, t_cls.numpy(), atol=2e-4)
    np.testing.assert_allclose(j_box, t_box.numpy(), atol=2e-4)
    np.testing.assert_allclose(j_dir, t_dir.numpy(), atol=2e-4)

    # decoded boxes follow (pcdet generate_predicted_boxes math in numpy)
    from pcp_tpu.models.dense_heads.anchor_head_single import (generate_anchors,
                                                               limit_period)
    from pcp_tpu.utils.box_coder_utils import ResidualCoder

    anchors, _ = generate_anchors(
        cfg.DENSE_HEAD["ANCHOR_GENERATOR_CONFIG"], (GRID, GRID, 1), PC_RANGE)
    dec = ResidualCoder().decode(
        jnp.asarray(t_box.numpy()), jnp.asarray(anchors.reshape(1, -1, 7)))
    dir_labels = t_dir.numpy().argmax(-1)
    period = np.pi
    rot = np.asarray(limit_period(
        jnp.asarray(dec[..., 6]) - 0.78539, 0.0, period))
    heading = rot + 0.78539 + period * dir_labels
    expected = np.asarray(dec).copy()
    expected[..., 6] = heading
    np.testing.assert_allclose(np.asarray(out["batch_box_preds"]), expected, atol=2e-3)
