"""Inference-time BN folding (FOLD_BN): exact equivalence to the BN graph.

fold_bn_variables bakes each BatchNorm into the preceding conv's
kernel+bias so the bf16 conv stack runs without flax BN's f32 stat
round-trips (perf item, VERDICT r3 weak #4). The fold must be exact in
f32 — trained BN stats are arbitrary, so the test uses randomized
scale/bias/mean/var, not init defaults.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.models.backbones_2d.base_bev_backbone import (
    BaseBEVBackbone,
    fold_bn_variables,
)

CFG = {
    "NAME": "BaseBEVBackbone",
    # flagship shape in miniature: covers ConvBNReLU, DownConvBNReLU (0.5)
    # and DeConvBNReLU (1, 2) folds
    "LAYER_NUMS": [2, 2, 2],
    "LAYER_STRIDES": [2, 2, 2],
    "NUM_FILTERS": [8, 16, 32],
    "UPSAMPLE_STRIDES": [0.5, 1, 2],
    "NUM_UPSAMPLE_FILTERS": [16, 16, 16],
}


def _randomize_bn(variables, rng):
    """Give every norm nontrivial params/stats (init is identity)."""

    def rnd(path, x):
        name = "/".join(str(p) for p in path)
        if "norm" not in name:
            return x
        r = rng.uniform(0.25, 2.0, size=x.shape).astype(np.float32)
        if name.endswith("var"):
            return jnp.asarray(r)
        return jnp.asarray(r - 1.0) if name.endswith(("bias", "mean")) else jnp.asarray(r)

    return jax.tree_util.tree_map_with_path(
        lambda p, x: rnd([getattr(k, "key", getattr(k, "name", k)) for k in p], x),
        variables,
    )


def test_fold_bn_exact_equivalence():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, size=(2, 32, 32, 8)).astype(np.float32))
    batch = {"spatial_features": x, "batch_size": 2}

    bb = BaseBEVBackbone(model_cfg=CFG, input_channels=8)
    v = bb.init(jax.random.PRNGKey(0), batch, train=False)
    v = _randomize_bn(v, rng)
    ref = bb.apply(v, batch, train=False)["spatial_features_2d"]

    folded_v = fold_bn_variables(v, module_name=None)
    assert "backbone_2d" not in folded_v.get("batch_stats", {})
    bbf = BaseBEVBackbone(model_cfg={**CFG, "FOLD_BN": True}, input_channels=8)
    got = bbf.apply(folded_v, batch, train=False)["spatial_features_2d"]

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fold_bn_shape_matches_folded_init():
    """Folded params must load into the FOLD_BN model: identical tree/shapes."""
    x = jnp.zeros((1, 16, 16, 8), np.float32)
    batch = {"spatial_features": x, "batch_size": 1}
    bb = BaseBEVBackbone(model_cfg=CFG, input_channels=8)
    v = bb.init(jax.random.PRNGKey(0), batch, train=False)
    folded_v = fold_bn_variables(v, module_name=None)

    bbf = BaseBEVBackbone(model_cfg={**CFG, "FOLD_BN": True}, input_channels=8)
    vf = bbf.init(jax.random.PRNGKey(0), batch, train=False)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, vf["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, folded_v["params"])
    assert ref_shapes == got_shapes


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
