"""PV-RCNN++: VectorPool aggregation, SPC keypoint sampling, E2E."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.backbones_3d.vector_pool import (VectorPoolAggregation,
                                                     local_voxel_offsets)
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from test_pvrcnn import PVRCNN_CFG


class TestVectorPool:
    def test_local_voxel_offsets(self):
        off = np.asarray(local_voxel_offsets((3, 3, 3), 1.2))
        assert off.shape == (27, 3)
        assert off.min() == pytest.approx(-0.8)  # (0.5/3)*2*1.2 - 1.2
        assert off.max() == pytest.approx(0.8)

    @pytest.mark.parametrize("agg", ["local_interpolation", "voxel_avg_pool"])
    def test_shapes_and_mask(self, agg):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-3, 3, (1, 64, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 64, 8)).astype(np.float32)
        new_xyz = rng.uniform(-3, 3, (1, 10, 3)).astype(np.float32)
        new_mask = np.ones((1, 10), bool)
        new_mask[0, -2:] = False
        mod = VectorPoolAggregation(
            input_channels=8, num_local_voxel=(2, 2, 2),
            local_aggregation_type=agg, num_reduced_channels=6,
            num_channels_of_local_aggregation=4, post_mlps=(16,),
            max_neighbor_distance=1.5, neighbor_nsample=16)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats),
                     jnp.ones((1, 64), bool), jnp.asarray(new_xyz),
                     jnp.asarray(new_mask), train=False)
        out = mod.apply(v, jnp.asarray(xyz), jnp.asarray(feats),
                        jnp.ones((1, 64), bool), jnp.asarray(new_xyz),
                        jnp.asarray(new_mask), train=False)
        assert out.shape == (1, 10, 16)
        np.testing.assert_allclose(np.asarray(out)[0, -2:], 0.0)  # masked queries
        assert np.isfinite(np.asarray(out)).all()


def _ppcfg():
    cfg = copy.deepcopy(PVRCNN_CFG)
    cfg["NAME"] = "PVRCNNPlusPlus"
    cfg["PFE"]["SAMPLE_METHOD"] = "SPC"
    cfg["PFE"]["SPC_SAMPLING"] = {"NUM_SECTORS": 6, "SAMPLE_RADIUS_WITH_ROI": 1.6}
    cfg["PFE"]["SA_LAYER"]["raw_points"] = {
        "NAME": "VectorPoolAggregationModuleMSG",
        "NUM_REDUCED_CHANNELS": 1,
        "NUM_CHANNELS_OF_LOCAL_AGGREGATION": 8,
        "LOCAL_AGGREGATION_TYPE": "local_interpolation",
        "MSG_POST_MLPS": [16],
        "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2], "MAX_NEIGHBOR_DISTANCE": 0.4,
                        "NEIGHBOR_NSAMPLE": 8, "POST_MLPS": [16, 16]},
        "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [3, 3, 3], "MAX_NEIGHBOR_DISTANCE": 1.2,
                        "NEIGHBOR_NSAMPLE": 8, "POST_MLPS": [16, 16]},
    }
    cfg["ROI_HEAD"]["ROI_GRID_POOL"] = {
        "NAME": "VectorPoolAggregationModuleMSG",
        "GRID_SIZE": 3,
        "NUM_REDUCED_CHANNELS": 16,
        "NUM_CHANNELS_OF_LOCAL_AGGREGATION": 8,
        "LOCAL_AGGREGATION_TYPE": "voxel_avg_pool",
        "MSG_POST_MLPS": [32],
        "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2], "MAX_NEIGHBOR_DISTANCE": 0.8,
                        "NEIGHBOR_NSAMPLE": 8, "POST_MLPS": [32]},
    }
    return cfg


class TestPVRCNNPlusPlusE2E:
    def test_forward_and_train(self):
        info = DatasetInfo(
            class_names=("car",), num_point_features=4,
            point_cloud_range=(-6.4, -6.4, -8.0, 6.4, 6.4, 0.0),
            voxel_size=(0.1, 0.1, 0.2), grid_size=(128, 128, 40))
        model = build_network(CfgDict(_ppcfg()), num_class=1, dataset_info=info)
        rng = np.random.default_rng(0)
        b, n = 1, 512
        pts = rng.uniform(-6, 6, (b, n, 4)).astype(np.float32)
        pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
        gt = np.zeros((b, 3, 8), np.float32)
        gt[:, 0] = [0, 0, -2, 3.9, 1.6, 1.56, 0.3, 1]
        batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
                 "gt_boxes": jnp.asarray(gt), "batch_size": b}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(4)},
            batch, train=True)
        out = model.apply(variables, batch, train=False)
        boxes = out["final_box_dicts"]["pred_boxes"]
        assert boxes.shape[:2] == (1, 16)
        assert bool(jnp.all(jnp.isfinite(boxes)))

        def loss_fn(p):
            o, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)})
            return o["loss"], o["tb_dict"]

        (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        assert "rcnn_loss" in tb
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))
