"""Focal sparse conv (VoxelBackBone8xFocal) at test-config scale.

Covers vs the reference focal_sparse_conv.py / spconv_backbone_focal.py:
  * set growth: foreground voxels spawn gated kernel-offset neighbors into
    the (budgeted) active set;
  * the focal supervision target (voxel center in any GT box) produces a
    finite loss with gradients through the importance conv;
  * the full SECONDNet-with-focal-backbone detector builds, evals, trains.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.config import CfgDict
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from tests.test_second_stage_heads import BASE, _info_and_batch


def test_focal_layer_grows_active_set():
    from pcp_tpu.models.backbones_3d.focal_sparse import FocalSparseConv
    from pcp_tpu.ops import sparse3d

    dims = (8, 16, 16)
    limit = dims[0] * dims[1] * dims[2]
    b, v, c = 1, 32, 8
    rng = np.random.default_rng(0)
    # a compact cluster of active voxels
    z = rng.integers(2, 5, v); y = rng.integers(4, 10, v); x = rng.integers(4, 10, v)
    ids = np.sort(np.unique(z * dims[1] * dims[2] + y * dims[2] + x))
    ids = np.pad(ids, (0, v - len(ids)), constant_values=limit)[None]
    feats = jnp.asarray(np.abs(rng.normal(size=(b, v, c))).astype(np.float32))

    layer = FocalSparseConv(c, c, voxel_stride=1, threshold=0.01, name="focal")
    fbatch = {"gt_boxes": jnp.zeros((b, 2, 8)),
              "voxel_size": (0.2, 0.2, 0.5), "pc_range": (-2, -2, -2, 2, 2, 2)}
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(ids), feats, dims,
                           fbatch, False)
    union, out, loss = layer.apply(variables, jnp.asarray(ids), feats, dims,
                                   fbatch, False)
    n_in = int((ids < limit).sum())
    n_out = int((np.asarray(union) < limit).sum())
    # threshold 0.01 -> nearly everything foreground, neighbors spawned
    assert n_out > n_in
    assert union.shape[1] == v + v // 2  # growth budget
    # originals are all preserved in the union
    assert set(ids[ids < limit].tolist()) <= set(
        np.asarray(union)[np.asarray(union) < limit].tolist())
    assert bool(jnp.all(jnp.isfinite(out)))


def test_focal_secondnet_e2e():
    import copy

    cfg = copy.deepcopy(BASE)
    cfg = dict(cfg)
    cfg["NAME"] = "SECONDNet"
    cfg["BACKBONE_3D"] = {"NAME": "VoxelBackBone8xFocal", "FOCAL_THRESHOLD": 0.5}
    # focal backbone's conv4 is 64ch; height compression folds z into channels
    cfg["MAP_TO_BEV"] = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256}

    info, batch = _info_and_batch()
    model = build_network(CfgDict(cfg), num_class=1, dataset_info=info)
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=False)
    assert out["final_box_dicts"]["pred_boxes"].shape[0] == 1
    assert bool(jnp.all(jnp.isfinite(out["final_box_dicts"]["pred_boxes"])))

    def loss_fn(p):
        o, _ = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})},
                           batch, train=True, mutable=["batch_stats"])
        return o["loss"], o["tb_dict"]

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert "loss_box_of_pts" in tb
    # gradient reaches the importance conv
    g = grads["backbone_3d"]["focal1"]["conv_imp"]
    assert float(jnp.sum(jnp.abs(g))) > 0
