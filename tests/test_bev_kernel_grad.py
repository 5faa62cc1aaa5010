import numpy as np
import jax
import jax.numpy as jnp

from pcp_tpu.ops.pallas.bev_scatter import bev_scatter_max_sorted


class TestBEVKernelGrad:
    def test_vjp_matches_xla_scatter_max(self, rng):
        b, n, c, h, w = 2, 512, 8, 8, 8
        pids = np.sort(rng.integers(0, h * w + 1, size=(b, n)).astype(np.int32), axis=1)
        feats = np.abs(rng.normal(0, 1, (b, n, c))).astype(np.float32)  # >= 0

        def via_kernel(f):
            return jnp.sum(bev_scatter_max_sorted(f, jnp.asarray(pids), h, w, True) ** 2)

        def via_xla(f):
            flat = jnp.zeros((b * h * w, c)).at[
                jnp.where(pids < h * w, pids + np.arange(b)[:, None] * h * w, b * h * w).reshape(-1)
            ].max(f.reshape(-1, c), mode="drop")
            return jnp.sum(flat**2)

        f = jnp.asarray(feats)
        v1, g1 = jax.value_and_grad(via_kernel)(f)
        v2, g2 = jax.value_and_grad(via_xla)(f)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        # gradients may differ only on exact ties; continuous random feats have none
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def test_train_step_through_kernel(self, rng):
        """The full model train step must differentiate through the kernel."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_forward import small_info, make_batch
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        model = build_network(cfg.MODEL, 1, small_info(13))
        batch = make_batch(rng, b=1, n=512)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return out["loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0


def test_prereduced_matches_default():
    """bev_scatter_max_sorted_prereduced == bev_scatter_max_sorted (values
    and VJP) at mixed occupancy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcp_tpu.ops.pallas.bev_scatter import (
        bev_scatter_max_sorted, bev_scatter_max_sorted_prereduced, use_interpret)

    rng = np.random.default_rng(0)
    b, n, c, h, w = 2, 512, 8, 16, 16
    # clustered ids: ~8 points per pillar + some singletons, sorted
    pid = np.sort(np.concatenate([
        rng.integers(0, h * w, n // 2) // 1,
        np.repeat(rng.integers(0, h * w, n // 16), 8),
    ])[:n].reshape(1, n).repeat(b, 0), axis=1).astype(np.int32)
    # mark a padding run
    pid[:, -20:] = h * w
    feats = jnp.asarray(np.abs(rng.normal(size=(b, n, c))).astype(np.float32))
    pids = jnp.asarray(pid)

    interp = use_interpret()
    ref = bev_scatter_max_sorted(feats, pids, h, w, interp)
    got = bev_scatter_max_sorted_prereduced(feats, pids, h, w, interp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def loss_ref(f):
        return jnp.sum(bev_scatter_max_sorted(f, pids, h, w, interp) ** 2)

    def loss_pre(f):
        return jnp.sum(bev_scatter_max_sorted_prereduced(f, pids, h, w, interp) ** 2)

    g_ref = jax.grad(loss_ref)(feats)
    g_pre = jax.grad(loss_pre)(feats)
    np.testing.assert_allclose(np.asarray(g_pre), np.asarray(g_ref), atol=1e-5)


def test_fused_matches_default():
    """bev_scatter_max_sorted_fused (in-kernel segmented sweep + tail stores)
    == bev_scatter_max_sorted, with n spanning several chunks so segments
    crossing chunk boundaries exercise the forced-tail partial stores."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcp_tpu.ops.pallas.bev_scatter import (
        CHUNK, bev_scatter_max_sorted, bev_scatter_max_sorted_fused, use_interpret)

    rng = np.random.default_rng(1)
    b, c, h, w = 2, 8, 16, 16
    n = 2 * CHUNK + 500  # forces padding + 3 chunks
    # heavy occupancy: big runs that straddle chunk boundaries + singletons
    pid = np.sort(np.concatenate([
        np.repeat(rng.integers(0, h * w, n // 64), 48),
        rng.integers(0, h * w, n),
    ])[:n].reshape(1, n).repeat(b, 0), axis=1).astype(np.int32)
    pid[:, -37:] = h * w  # padding run
    feats = jnp.asarray(np.abs(rng.normal(size=(b, n, c))).astype(np.float32))
    pids = jnp.asarray(pid)

    interp = use_interpret()
    ref = bev_scatter_max_sorted(feats, pids, h, w, interp)
    got = bev_scatter_max_sorted_fused(feats, pids, h, w, interp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def loss_ref(f):
        return jnp.sum(bev_scatter_max_sorted(f, pids, h, w, interp) ** 2)

    def loss_fused(f):
        return jnp.sum(bev_scatter_max_sorted_fused(f, pids, h, w, interp) ** 2)

    g_ref = jax.grad(loss_ref)(feats)
    g_fused = jax.grad(loss_fused)(feats)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_onehot_matches_default():
    """bev_scatter_max_sorted_onehot (MXU one-hot placement, in-kernel sweep,
    3-way bf16 value split) == bev_scatter_max_sorted to ~2^-24 relative,
    with segments straddling the ONEHOT_CHUNK boundary (forced-tail partial
    maxima combined across chunk iterations) and a padding run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pcp_tpu.ops.pallas.bev_scatter import (
        ONEHOT_CHUNK, bev_scatter_max_sorted, bev_scatter_max_sorted_onehot,
        use_interpret)

    rng = np.random.default_rng(3)
    b, c, h, w = 1, 8, 8, 16
    n = 2 * ONEHOT_CHUNK + 100  # padding + segments across chunk boundaries
    pid = np.sort(np.concatenate([
        np.repeat(rng.integers(0, h * w, n // 64), 48),
        rng.integers(0, h * w, n),
    ])[:n].reshape(1, n).repeat(b, 0), axis=1).astype(np.int32)
    pid[:, -23:] = h * w  # padding run
    feats = jnp.asarray(np.abs(rng.normal(size=(b, n, c))).astype(np.float32))
    pids = jnp.asarray(pid)

    interp = use_interpret()
    ref = bev_scatter_max_sorted(feats, pids, h, w, interp)
    got = bev_scatter_max_sorted_onehot(feats, pids, h, w, interp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def loss_ref(f):
        return jnp.sum(bev_scatter_max_sorted(f, pids, h, w, interp) ** 2)

    def loss_oh(f):
        return jnp.sum(bev_scatter_max_sorted_onehot(f, pids, h, w, interp) ** 2)

    g_ref = jax.grad(loss_ref)(feats)
    g_oh = jax.grad(loss_oh)(feats)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ref), atol=1e-5)
