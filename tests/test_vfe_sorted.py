import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.config import CfgDict
from pcp_tpu.models.vfe.dynamic_pillar_vfe import DynamicPillarVFE


def make_vfe(use_sorted, num_feats=5, pre_reduce=False):
    cfg = CfgDict(
        {
            "NUM_RAW_POINT_FEATURES": num_feats,
            "WITH_DISTANCE": False,
            "USE_ABSLOTE_XYZ": True,
            "USE_NORM": True,
            "NUM_FILTERS": [64, 64],
            "PRE_REDUCE": pre_reduce,
        }
    )
    return DynamicPillarVFE(
        model_cfg=cfg,
        num_point_features=num_feats,
        voxel_size=(0.2, 0.2, 8.0),
        grid_size=(128, 128, 1),
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        use_sorted=use_sorted,
    )


class TestSortedVFE:
    @pytest.mark.parametrize("train", [False, True])
    def test_sorted_matches_scatter(self, rng, train):
        """The sorted+Pallas pipeline must reproduce the legacy XLA-scatter
        pipeline bit-for-bit (same params, same batch)."""
        b, n = 2, 4096
        pts = rng.uniform(-12.5, 12.5, size=(b, n, 5)).astype(np.float32)
        pts[..., 2] = rng.uniform(-3, -0.5, size=(b, n))
        mask = np.ones((b, n), dtype=bool)
        mask[:, -200:] = False
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.asarray(mask),
            "batch_size": b,
        }
        vfe_legacy = make_vfe(False)
        vfe_sorted = make_vfe(True)
        variables = vfe_legacy.init(jax.random.PRNGKey(0), batch, train=False)

        if train:
            out_a, upd_a = vfe_legacy.apply(variables, batch, train=True, mutable=["batch_stats"])
            out_b, upd_b = vfe_sorted.apply(variables, batch, train=True, mutable=["batch_stats"])
            for (ka, va), (kb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(upd_a["batch_stats"]),
                jax.tree_util.tree_leaves_with_path(upd_b["batch_stats"]),
            ):
                np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-5)
        else:
            out_a = vfe_legacy.apply(variables, batch, train=False)
            out_b = vfe_sorted.apply(variables, batch, train=False)

        a = np.asarray(out_a["pillar_features"])
        bb = np.asarray(out_b["pillar_features"])
        np.testing.assert_allclose(a, bb, rtol=1e-4, atol=1e-4)
        assert np.abs(a).sum() > 0

    @pytest.mark.parametrize("pre_reduce", [True, "fused"])
    def test_pre_reduce_matches_default(self, rng, pre_reduce):
        """MODEL.VFE.PRE_REDUCE (XLA-scan fold / in-kernel fused sweep) must
        reproduce the default per-point kernel exactly."""
        b, n = 2, 2048
        pts = rng.uniform(-12.5, 12.5, size=(b, n, 5)).astype(np.float32)
        pts[..., 2] = rng.uniform(-3, -0.5, size=(b, n))
        # duplicate runs so segments have realistic multi-point occupancy
        pts[:, n // 2:, 0:2] = pts[:, : n // 2, 0:2]
        mask = np.ones((b, n), dtype=bool)
        mask[:, -100:] = False
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.asarray(mask),
            "batch_size": b,
        }
        vfe_default = make_vfe(True)
        vfe_pre = make_vfe(True, pre_reduce=pre_reduce)
        variables = vfe_default.init(jax.random.PRNGKey(0), batch, train=False)
        out_a = vfe_default.apply(variables, batch, train=False)
        out_b = vfe_pre.apply(variables, batch, train=False)
        np.testing.assert_allclose(
            np.asarray(out_a["pillar_features"]),
            np.asarray(out_b["pillar_features"]),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_empty_cloud(self, rng):
        b, n = 1, 512
        batch = {
            "points": jnp.asarray(rng.uniform(-12, 12, (b, n, 5)).astype(np.float32)),
            "points_mask": jnp.zeros((b, n), dtype=bool),
            "batch_size": b,
        }
        vfe = make_vfe(True)
        variables = vfe.init(jax.random.PRNGKey(0), batch, train=False)
        out = vfe.apply(variables, batch, train=False)
        assert float(jnp.abs(out["pillar_features"]).sum()) == 0.0
