"""Differential tests: sparse 3D conv engine vs dense lax.conv references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.ops import sparse3d


def make_sparse(rng, b=2, v=64, dims=(5, 12, 12), c=4):
    nz, ny, nx = dims
    limit = nz * ny * nx
    ids = np.full((b, v), limit, np.int32)
    feats = np.zeros((b, v, c), np.float32)
    for i in range(b):
        n_act = rng.integers(v // 2, v)
        chosen = np.sort(rng.choice(limit, size=n_act, replace=False)).astype(np.int32)
        ids[i, :n_act] = chosen
        feats[i, :n_act] = rng.normal(0, 1, (n_act, c))
    return jnp.asarray(ids), jnp.asarray(feats)


def to_dense(ids, feats, dims):
    return np.asarray(sparse3d.sparse_to_dense(ids, feats, dims))


class TestSparseOps:
    def test_gather_map(self, rng):
        dims = (4, 8, 8)
        limit = dims[0] * dims[1] * dims[2]
        ids, _ = make_sparse(rng, b=1, v=32, dims=dims)
        queries = jnp.concatenate([ids[:, 5:10], jnp.full((1, 3), limit, jnp.int32)], axis=1)
        pos = np.asarray(sparse3d.build_gather_map(ids, queries, limit))
        assert (pos[0, :5] == np.arange(5, 10)).all()
        assert (pos[0, 5:] == -1).all()

    def test_subm_conv_matches_dense(self, rng):
        dims = (5, 10, 10)
        cin, cout = 4, 6
        ids, feats = make_sparse(rng, b=2, v=48, dims=dims, c=cin)
        offs = sparse3d.kernel_offsets(3)
        w = rng.normal(0, 0.3, (27, cin, cout)).astype(np.float32)

        nmap = sparse3d.neighbor_map_subm(ids, offs, dims)
        got = np.asarray(sparse3d.subm_conv_apply(feats, nmap, jnp.asarray(w)))

        # dense reference: conv over dense grid, read at active sites only
        dense = to_dense(ids, feats, dims)  # (B, nz, ny, nx, C)
        kernel = w.reshape(3, 3, 3, cin, cout)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(dense), jnp.asarray(kernel), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        ref = np.asarray(ref).reshape(2, -1, cout)
        limit = dims[0] * dims[1] * dims[2]
        for b in range(2):
            for j in range(ids.shape[1]):
                vid = int(ids[b, j])
                if vid >= limit:
                    continue
                np.testing.assert_allclose(got[b, j], ref[b, vid], rtol=1e-4, atol=1e-4)

    def test_strided_conv_matches_dense(self, rng):
        dims = (5, 8, 8)
        out_dims = (3, 4, 4)  # k3 s2 p1
        cin, cout = 3, 5
        ids, feats = make_sparse(rng, b=2, v=40, dims=dims, c=cin)
        w = rng.normal(0, 0.3, (27, cin, cout)).astype(np.float32)

        out_ids = sparse3d.strided_output_ids(ids, dims, out_dims, 3, 2, 1, budget=64)
        got = np.asarray(
            sparse3d.strided_conv_apply(ids, feats, out_ids, dims, out_dims, 3, 2, 1, jnp.asarray(w))
        )
        dense = to_dense(ids, feats, dims)
        kernel = w.reshape(3, 3, 3, cin, cout)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(dense), jnp.asarray(kernel), (2, 2, 2),
            [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        ref = np.asarray(ref).reshape(2, -1, cout)
        limit_out = out_dims[0] * out_dims[1] * out_dims[2]
        for b in range(2):
            for j in range(out_ids.shape[1]):
                vid = int(out_ids[b, j])
                if vid >= limit_out:
                    continue
                np.testing.assert_allclose(got[b, j], ref[b, vid], rtol=1e-4, atol=1e-4)

    def test_strided_output_sites_cover_dense_nonzero(self, rng):
        dims = (5, 8, 8)
        out_dims = (3, 4, 4)
        ids, feats = make_sparse(rng, b=1, v=30, dims=dims, c=2)
        feats = jnp.abs(feats) + jnp.where(
            (ids < dims[0] * dims[1] * dims[2])[..., None], 1.0, 0.0
        )  # strictly positive at active sites
        out_ids = np.asarray(sparse3d.strided_output_ids(ids, dims, out_dims, 3, 2, 1, budget=96))
        dense = to_dense(ids, jnp.abs(feats), dims)
        ones_k = jnp.ones((3, 3, 3, 2, 1))
        cov = jax.lax.conv_general_dilated(
            jnp.asarray(dense), ones_k, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        nonzero = set(np.nonzero(np.asarray(cov).reshape(-1) > 0)[0].tolist())
        active = set(int(i) for i in out_ids[0] if i < out_dims[0] * out_dims[1] * out_dims[2])
        assert nonzero == active


class TestSecondModel:
    def test_v2x_second_forward(self, rng):
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network
        from pcp_tpu.models.detectors.detector_template import DatasetInfo

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_second_rsu.yaml", cfg)
        info = DatasetInfo(
            class_names=("car",),
            num_point_features=7,
            point_cloud_range=(-6.4, -6.4, -8.0, 6.4, 6.4, 0.0),
            voxel_size=(0.1, 0.1, 0.2),
            grid_size=(128, 128, 40),
        )
        model = build_network(cfg.MODEL, num_class=1, dataset_info=info)
        b, n = 1, 1024
        pts = rng.uniform(-6, 6, (b, n, 7)).astype(np.float32)
        pts[..., 2] = rng.uniform(-7.5, -0.5, (b, n))
        pts[..., 5] = rng.integers(0, 11, (b, n))
        pts[..., 6] = -1
        gt = np.zeros((b, 4, 8), np.float32)
        gt[:, :2, 3:6] = [4.0, 1.8, 1.5]
        gt[:, :2, 2] = -1.5
        gt[:, :2, 7] = 1
        tf = np.tile(np.eye(4, dtype=np.float32)[None, None, None], (b, 8, 11, 1, 1))
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.ones((b, n), bool),
            "gt_boxes": jnp.asarray(gt),
            "instances_tf": jnp.asarray(tf),
            "batch_size": b,
        }
        # init in train mode so the training-only object head gets params
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        out = model.apply(variables, batch, train=False)
        assert "final_box_dicts" in out
        out2, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
        assert np.isfinite(float(out2["loss"]))
