"""Differential tests for pcp_tpu.ops.pointnet2 against straight-line numpy
re-executions of the reference CUDA kernel semantics
(/root/reference/pcdet/ops/pointnet2/pointnet2_batch/src/*.cu)."""
import numpy as np
import jax.numpy as jnp

from pcp_tpu.ops import pointnet2 as pn2


def ref_fps(xyz, npoint):
    """sampling_gpu.cu farthest_point_sampling: start at 0, running min-dist."""
    n = xyz.shape[0]
    idx = np.zeros(npoint, np.int32)
    temp = np.full(n, 1e10)
    last = 0
    for i in range(npoint):
        idx[i] = last
        d2 = np.sum((xyz - xyz[last]) ** 2, axis=1)
        temp = np.minimum(temp, d2)
        last = int(np.argmax(temp))
    return idx


def ref_ball_query(radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:31-46 exact re-execution."""
    m, n = new_xyz.shape[0], xyz.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    for j in range(m):
        cnt = 0
        for k in range(n):
            d2 = np.sum((new_xyz[j] - xyz[k]) ** 2)
            if d2 < radius * radius:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return idx


def test_fps_matches_reference():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, size=(2, 128, 3)).astype(np.float32)
    got = np.asarray(pn2.farthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], ref_fps(xyz[b], 16))


def test_fps_mask_excludes_padding():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-10, 10, size=(1, 64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    mask[40:] = False
    xyz[0, 40:] = 1e3  # would dominate FPS if not masked
    got = np.asarray(pn2.farthest_point_sample(jnp.asarray(xyz), 12, jnp.asarray(mask[None])))
    assert got.max() < 40
    np.testing.assert_array_equal(got[0], ref_fps(xyz[0, :40], 12))


def test_ball_query_matches_reference():
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-5, 5, size=(2, 200, 3)).astype(np.float32)
    new_xyz = rng.uniform(-5, 5, size=(2, 33, 3)).astype(np.float32)
    idx, empty = pn2.ball_query(2.0, 16, jnp.asarray(xyz), jnp.asarray(new_xyz))
    idx = np.asarray(idx)
    for b in range(2):
        expected = ref_ball_query(2.0, 16, xyz[b], new_xyz[b])
        np.testing.assert_array_equal(idx[b], expected)
    # empty flag consistent with all-zero reference rows that truly have no hits
    for b in range(2):
        for j in range(33):
            has = np.any(np.sum((xyz[b] - new_xyz[b, j]) ** 2, axis=1) < 4.0)
            assert bool(np.asarray(empty)[b, j]) == (not has)


def test_ball_query_mask():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-1, 1, size=(1, 50, 3)).astype(np.float32)
    mask = np.ones(50, bool)
    mask[25:] = False
    idx, _ = pn2.ball_query(5.0, 8, jnp.asarray(xyz), jnp.asarray(xyz[:, :4]),
                            mask=jnp.asarray(mask[None]))
    assert np.asarray(idx).max() < 25


def test_three_nn_and_interpolate():
    rng = np.random.default_rng(4)
    known = rng.uniform(-5, 5, size=(1, 40, 3)).astype(np.float32)
    unknown = rng.uniform(-5, 5, size=(1, 70, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 40, 6)).astype(np.float32)
    dist, idx = pn2.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for j in range(70):
        d = np.sqrt(np.sum((known[0] - unknown[0, j]) ** 2, axis=1))
        order = np.argsort(d)[:3]
        np.testing.assert_allclose(np.sort(dist[0, j]), np.sort(d[order]), rtol=1e-5)
        assert set(idx[0, j]) == set(order)
    # interpolation: inverse-distance weights sum to the right combo
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    out = np.asarray(pn2.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    expect = (feats[0][idx[0]] * w[0][..., None]).sum(1)
    np.testing.assert_allclose(out[0], expect, rtol=1e-5)


def test_group_points_shape():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(2, 30, 5)).astype(np.float32)
    idx = rng.integers(0, 30, size=(2, 7, 4)).astype(np.int32)
    out = np.asarray(pn2.group_points(jnp.asarray(pts), jnp.asarray(idx)))
    assert out.shape == (2, 7, 4, 5)
    np.testing.assert_allclose(out[1, 3, 2], pts[1, idx[1, 3, 2]])
