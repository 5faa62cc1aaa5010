"""Part-A2 stack: UNetV2 decoder (incl. inverse sparse conv), intra-part
head, ROI-aware pooling, and the full detector tiny-E2E."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.ops import sparse3d
from pcp_tpu.ops.roiaware_pool import roiaware_pool3d


class TestInverseConv:
    def test_matches_dense_conv_transpose(self):
        """inverse_conv_apply vs dense grad-of-conv on a small grid."""
        rng = np.random.default_rng(0)
        dims_f = (4, 6, 6)
        dims_c = (2, 3, 3)
        limit_f = np.prod(dims_f)
        # fine active set: all sites (dense case isolates the conv math)
        fine_ids = jnp.asarray(np.arange(limit_f, dtype=np.int32)[None])
        limit_c = np.prod(dims_c)
        coarse_ids = jnp.asarray(np.arange(limit_c, dtype=np.int32)[None])
        cin, cout = 3, 2
        coarse = rng.normal(size=(1, limit_c, cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32)

        got = sparse3d.inverse_conv_apply(
            coarse_ids, jnp.asarray(coarse), fine_ids, dims_f, dims_c,
            3, 2, 1, jnp.asarray(w))
        got = np.asarray(got).reshape(dims_f + (cout,))

        # dense transposed conv: out[i] = sum_k W_k in[(i+p-k)/s]
        dense_c = coarse.reshape((1,) + dims_c + (cin,))
        expect = np.zeros(dims_f + (cout,), np.float32)
        k_idx = 0
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    for z in range(dims_f[0]):
                        for y in range(dims_f[1]):
                            for x in range(dims_f[2]):
                                nz, ny, nx = z + 1 - dz, y + 1 - dy, x + 1 - dx
                                if nz % 2 or ny % 2 or nx % 2:
                                    continue
                                oz, oy, ox = nz // 2, ny // 2, nx // 2
                                if not (0 <= oz < dims_c[0] and 0 <= oy < dims_c[1]
                                        and 0 <= ox < dims_c[2]):
                                    continue
                                expect[z, y, x] += dense_c[0, oz, oy, ox] @ w[k_idx]
                    k_idx += 1
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


class TestRoiAwarePool:
    def test_max_and_avg(self):
        pts = np.array([[[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0], [50, 50, 50]]], np.float32)
        feats = np.array([[[2.0], [4.0], [100.0]]], np.float32)
        rois = np.array([[[0.0, 0, 0, 2.0, 2.0, 2.0, 0.0]]], np.float32)
        mx = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                        jnp.asarray(rois), out_size=2, pool_method="max"))
        av = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                        jnp.asarray(rois), out_size=2, pool_method="avg"))
        # point (0.5,0,0) -> unit (0.75, 0.5, 0.5) -> cell (1,1,1)
        assert mx[0, 0, 1, 1, 1, 0] == 2.0
        assert mx[0, 0, 0, 1, 1, 0] == 4.0
        assert av[0, 0, 1, 1, 1, 0] == 2.0
        # far point never pooled
        assert mx.max() <= 4.0

    def test_rotation_moves_cells(self):
        # (off the exact cell boundary: cos(pi/2) float noise flips int(0.5*P))
        pts = np.array([[[0.9, 0.1, 0.0]]], np.float32)
        feats = np.ones((1, 1, 1), np.float32)
        roi0 = np.array([[[0.0, 0, 0, 2.0, 2.0, 2.0, 0.0]]], np.float32)
        roi90 = np.array([[[0.0, 0, 0, 2.0, 2.0, 2.0, np.pi / 2]]], np.float32)
        m0 = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                        jnp.asarray(roi0), 2, "max"))
        m90 = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                         jnp.asarray(roi90), 2, "max"))
        assert m0[0, 0, 1, 1, 1, 0] == 1.0  # +x cell
        assert m90[0, 0, 1, 0, 1, 0] == 1.0  # rotated into -y cell


PARTA2_CFG = {
    "NAME": "PartA2Net",
    "VFE": {"NAME": "MeanVFE", "NUM_POINT_FEATURES": 4, "MAX_VOXELS": 512},
    "BACKBONE_3D": {"NAME": "UNetV2", "RETURN_ENCODED_TENSOR": True},
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
    "POINT_HEAD": {
        "NAME": "PointIntraPartOffsetHead",
        "CLS_FC": [16], "PART_FC": [16],
        "CLASS_AGNOSTIC": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_REG": "smooth-l1",
                        "LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                                         "point_part_weight": 1.0}},
    },
    "ROI_HEAD": {
        "NAME": "PartA2FCHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [32], "REG_FC": [32], "DP_RATIO": 0.0,
        "SEG_MASK_SCORE_THRESH": 0.3,
        "ROI_AWARE_POOL": {"POOL_SIZE": 4, "NUM_FEATURES": 32,
                           "MAX_POINTS_PER_VOXEL": 128},
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.7},
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "roi_iou",
            "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.65,
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
        "SCORE_THRESH": 0.1, "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
    },
}


class TestPartA2E2E:
    def test_forward_and_train(self):
        info = DatasetInfo(
            class_names=("car",), num_point_features=4,
            point_cloud_range=(-6.4, -6.4, -8.0, 6.4, 6.4, 0.0),
            voxel_size=(0.1, 0.1, 0.2), grid_size=(128, 128, 40))
        model = build_network(CfgDict(PARTA2_CFG), num_class=1, dataset_info=info)
        rng = np.random.default_rng(0)
        b, n = 1, 512
        pts = rng.uniform(-6, 6, (b, n, 4)).astype(np.float32)
        pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
        gt = np.zeros((b, 3, 8), np.float32)
        gt[:, 0] = [0, 0, -2, 3.9, 1.6, 1.56, 0.3, 1]
        batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
                 "gt_boxes": jnp.asarray(gt), "batch_size": b}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
            batch, train=True)
        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape[:2] == (1, 16)
        assert bool(jnp.all(jnp.isfinite(boxes)))
        assert "point_part_offset" in out

        def loss_fn(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)})
            return o["loss"], o["tb_dict"]

        (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        assert "point_loss_part" in tb and "rcnn_loss" in tb
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))
