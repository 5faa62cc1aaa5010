"""CaDDN camera stack: depth binning, frustum sampling geometry, tiny E2E."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.models.vfe.image_vfe import bin_depths, trilinear_sample_frustum


class TestBinDepths:
    def test_ud(self):
        d = jnp.asarray([2.0, 10.0, 45.0])
        idx = bin_depths(d, "UD", 2.0, 46.0, 44, target=True)
        np.testing.assert_array_equal(np.asarray(idx), [0, 8, 43])

    def test_lid_monotonic_and_bounds(self):
        d = jnp.linspace(2.0, 46.0, 50)
        idx = np.asarray(bin_depths(d, "LID", 2.0, 46.0, 80, target=True))
        assert (np.diff(idx) >= 0).all()
        assert idx[0] == 0 and idx[-1] <= 80
        # out-of-range -> overflow bin
        oob = bin_depths(jnp.asarray([100.0, -5.0]), "LID", 2.0, 46.0, 80, target=True)
        np.testing.assert_array_equal(np.asarray(oob), [80, 80])


class TestTrilinearSample:
    def test_exact_grid_points(self):
        rng = np.random.default_rng(0)
        frustum = rng.normal(size=(1, 4, 5, 6, 3)).astype(np.float32)
        # normalized coords of exact lattice point (d=2, v=1, u=3)
        norm = np.array([[[[[2 * 3 / 5 - 1, 2 * 1 / 4 - 1, 2 * 2 / 3 - 1]]]]], np.float32)
        out = np.asarray(trilinear_sample_frustum(jnp.asarray(frustum), jnp.asarray(norm)))
        np.testing.assert_allclose(out[0, 0, 0, 0], frustum[0, 2, 1, 3], rtol=1e-5)

    def test_oob_zero(self):
        frustum = np.ones((1, 3, 3, 3, 2), np.float32)
        norm = np.full((1, 1, 1, 1, 3), -2.0, np.float32)
        out = np.asarray(trilinear_sample_frustum(jnp.asarray(frustum), jnp.asarray(norm)))
        np.testing.assert_allclose(out, 0.0)


CADDN_CFG = {
    "NAME": "CaDDN",
    "VFE": {
        "NAME": "ImageVFE",
        "DOWNSAMPLE_FACTOR": 4,
        "FFN": {
            "NAME": "DepthFFN",
            "DDN": {"NAME": "DDNDeepLabV3", "BACKBONE_NAME": "ResNet101",
                    "ARGS": {"feat_extract_layer": "layer1",
                             "disc_cfg": {"mode": "LID", "num_bins": 16,
                                          "depth_min": 2.0, "depth_max": 46.0}}},
            "CHANNEL_REDUCE": {"in_channels": 32, "out_channels": 16,
                               "kernel_size": 1, "stride": 1, "bias": False},
            "LOSS": {"NAME": "DDNLoss",
                     "ARGS": {"weight": 3.0, "alpha": 0.25, "gamma": 2.0,
                              "fg_weight": 13, "bg_weight": 1}},
        },
        "F2V": {"NAME": "FrustumToVoxel", "SAMPLER": {"mode": "bilinear",
                                                      "padding_mode": "zeros"}},
    },
    "MAP_TO_BEV": {"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 16,
                   "ARGS": {"kernel_size": 1, "stride": 1, "bias": False}},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": 1,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45}],
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
                       "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 128,
                       "NMS_POST_MAXSIZE": 16},
    },
}


class TestCaDDNE2E:
    def test_forward_and_train(self):
        info = DatasetInfo(
            class_names=("Car",), num_point_features=3,
            point_cloud_range=(2.0, -6.4, -3.0, 14.8, 6.4, 1.0),
            voxel_size=(0.4, 0.4, 0.4), grid_size=(32, 32, 10))
        model = build_network(CfgDict(CADDN_CFG), num_class=1, dataset_info=info)
        rng = np.random.default_rng(0)
        b, h, w = 1, 32, 64
        images = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
        l2c = np.tile(np.array(
            [[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
            np.float32)[None], (b, 1, 1))
        c2i = np.tile(np.array(
            [[40.0, 0, w / 2, 0], [0, 40.0, h / 2, 0], [0, 0, 1, 0]],
            np.float32)[None], (b, 1, 1))
        gt = np.zeros((b, 2, 8), np.float32)
        gt[:, 0] = [8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1]
        depth_maps = rng.uniform(2, 40, (b, h, w)).astype(np.float32)
        boxes2d = np.zeros((b, 2, 4), np.float32)
        boxes2d[:, 0] = [10, 8, 40, 24]
        batch = {
            "images": jnp.asarray(images),
            "trans_lidar_to_cam": jnp.asarray(l2c),
            "trans_cam_to_img": jnp.asarray(c2i),
            "depth_maps": jnp.asarray(depth_maps),
            "gt_boxes2d": jnp.asarray(boxes2d),
            "gt_boxes": jnp.asarray(gt),
            "batch_size": b,
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape == (1, 16, 7)
        assert bool(jnp.all(jnp.isfinite(boxes)))
        # frustum volume has the configured shape
        assert out["frustum_features"].shape == (1, 16, 8, 16, 16)

        def loss_fn(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"])
            return o["loss"], o["tb_dict"]

        (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        assert "ddn_loss" in tb
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))
