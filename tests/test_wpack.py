"""W_PACK width-packing: exact equivalence to the standard backbone.

Narrow (<=64ch) BEV-backbone levels half-fill the 128-wide MXU (measured
~28 TFLOP/s effective vs ~113 at 128ch, tools/exp_backbone_blocks.py).
``W_PACK: True`` runs those levels on a (H, W/2, 2C) layout with structured
(3,3,2Ci,2Co) kernels built by ``w_pack_variables`` from standard-trained
weights. The transform must be EXACT in f32: same deployment contract as
FOLD_BN (train flag-off, transform at load, inference with the flag on).
Reference semantics preserved: base_bev_backbone.py:6-112 (conv/BN/ReLU
stack unchanged up to reassociation-free reordering of zero terms).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.models.backbones_2d.base_bev_backbone import (
    BaseBEVBackbone,
    _pack_kernel,
    w_pack_variables,
)

# flagship shape in miniature: level 0 narrow (packed), levels 1-2 wide
CFG = {
    "NAME": "BaseBEVBackbone",
    "LAYER_NUMS": [3, 2, 2],
    "LAYER_STRIDES": [2, 2, 2],
    "NUM_FILTERS": [8, 16, 32],
    "UPSAMPLE_STRIDES": [0.5, 1, 2],
    "NUM_UPSAMPLE_FILTERS": [16, 16, 16],
}


def _randomize_bn(variables, rng):
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


def _pack_cfg(extra=None):
    c = dict(CFG)
    # the real gate is NUM_FILTERS <= 64; the miniature uses 8ch at level 0,
    # so pack exactly the levels the helper selects (8 <= 64 -> level 0 only
    # among strides in (1,2)); levels 1/2 stay standard like block1/2
    c["NUM_FILTERS"] = [8, 128, 128]
    c["W_PACK"] = True
    if extra:
        c.update(extra)
    return c


def _std_cfg(extra=None):
    c = _pack_cfg(extra)
    c = dict(c)
    c["W_PACK"] = False
    return c


def test_pack_kernel_s1_matches_direct_conv():
    """Single 3x3 s1 conv: packed layout + structured kernel == direct conv."""
    rng = np.random.default_rng(1)
    C = 4
    W = rng.normal(0, 1, size=(3, 3, C, C)).astype(np.float32)
    x = rng.normal(0, 1, size=(1, 6, 8, C)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    K = _pack_kernel(W, strided=False)
    xp = jnp.asarray(x).reshape(1, 6, 4, 2 * C)
    yp = jax.lax.conv_general_dilated(
        xp, jnp.asarray(K), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = yp.reshape(1, 6, 4, 2, C).reshape(1, 6, 8, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_kernel_s2_matches_direct_conv():
    """3x3 stride-2 conv (the block's first conv) under packing."""
    rng = np.random.default_rng(2)
    Ci, Co = 4, 6
    W = rng.normal(0, 1, size=(3, 3, Ci, Co)).astype(np.float32)
    x = rng.normal(0, 1, size=(1, 8, 12, Ci)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1,4,6,Co)
    K = _pack_kernel(W, strided=True)
    xp = jnp.asarray(x).reshape(1, 8, 6, 2 * Ci)
    yp = jax.lax.conv_general_dilated(
        xp, jnp.asarray(K), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1,4,3,2Co)
    got = yp.reshape(1, 4, 3, 2, Co).reshape(1, 4, 6, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wpack_backbone_exact_equivalence():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, size=(2, 32, 32, 8)).astype(np.float32))
    batch = {"spatial_features": x, "batch_size": 2}

    std = BaseBEVBackbone(model_cfg=_std_cfg(), input_channels=8)
    v = std.init(jax.random.PRNGKey(0), batch, train=False)
    v = _randomize_bn(v, rng)
    ref = std.apply(v, batch, train=False)["spatial_features_2d"]

    packed = BaseBEVBackbone(model_cfg=_pack_cfg(), input_channels=8)
    pv = w_pack_variables(v, _pack_cfg(), module_name=None)
    got = packed.apply(pv, batch, train=False)["spatial_features_2d"]
    # zero-padded extra taps contribute exact zeros; conv accumulation order
    # may still differ -> tight-but-not-bitwise tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_wpack_with_folded_bn():
    """FOLD_BN -> W_PACK composition (bias tiling path)."""
    from pcp_tpu.models.backbones_2d.base_bev_backbone import fold_bn_variables

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, size=(1, 16, 16, 8)).astype(np.float32))
    batch = {"spatial_features": x, "batch_size": 1}

    std = BaseBEVBackbone(model_cfg=_std_cfg(), input_channels=8)
    v = std.init(jax.random.PRNGKey(1), batch, train=False)
    v = _randomize_bn(v, rng)
    ref = std.apply(v, batch, train=False)["spatial_features_2d"]

    fv = fold_bn_variables(v, module_name=None)
    both = _pack_cfg({"FOLD_BN": True})
    packed = BaseBEVBackbone(model_cfg=both, input_channels=8)
    pv = w_pack_variables(fv, both, module_name=None)
    got = packed.apply(pv, batch, train=False)["spatial_features_2d"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_wpack_training_asserts():
    packed = BaseBEVBackbone(model_cfg=_pack_cfg(), input_channels=8)
    x = jnp.zeros((1, 16, 16, 8))
    batch = {"spatial_features": x, "batch_size": 1}
    with pytest.raises(AssertionError, match="inference-only"):
        packed.init(jax.random.PRNGKey(0), batch, train=True)
