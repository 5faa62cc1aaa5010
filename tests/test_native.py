"""Native C++ kernels vs numpy fallbacks (differential)."""
import numpy as np
import pytest

from pcp_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


class TestNative:
    def test_builds(self, lib_available):
        assert lib_available, "g++ build of the native library failed"

    def test_transform_points(self, rng, lib_available):
        from pcp_tpu.utils.geometry import make_se3

        pts = rng.normal(0, 10, (1000, 5)).astype(np.float32)
        se3 = make_se3([1.0, -2.0, 0.5], yaw=0.7)
        want = pts.copy()
        want[:, :3] = want[:, :3] @ se3[:3, :3].T + se3[:3, 3]
        got = native.transform_points_(pts.copy(), se3)
        np.testing.assert_allclose(got[:, :3], want[:, :3], rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(got[:, 3:], want[:, 3:])

    def test_sweep_expand_matches_numpy(self, rng, lib_available):
        from pcp_tpu.utils.geometry import make_se3

        n, s = 57, 11
        pts = rng.normal(0, 2, (n, 4)).astype(np.float32)
        poses = np.stack([make_se3(rng.normal(0, 5, 3), yaw=rng.uniform(-3, 3)) for _ in range(s)])
        timelags = np.linspace(1, 0, s)
        got = native.sweep_expand(pts, poses, timelags, inst_idx=7)
        assert got.shape == (s * n, 7)
        # numpy reference
        batch = np.tile(pts[None], (s, 1, 1))
        xyz = np.einsum("sij,snj->sni", poses[:, :3, :3], batch[:, :, :3]) + poses[:, None, :3, 3]
        np.testing.assert_allclose(got.reshape(s, n, 7)[:, :, :3], xyz, rtol=1e-4, atol=1e-4)
        assert (got.reshape(s, n, 7)[:, :, 6] == 7).all()
        np.testing.assert_allclose(got.reshape(s, n, 7)[:, 0, 4], timelags, rtol=1e-6)

    def test_points_in_boxes_matches(self, rng, lib_available):
        pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
        boxes = np.zeros((6, 7), dtype=np.float32)
        boxes[:, :2] = rng.uniform(-8, 8, (6, 2))
        boxes[:, 2] = 0.0
        boxes[:, 3:6] = rng.uniform(1, 5, (6, 3))
        boxes[:, 6] = rng.uniform(-3, 3, 6)
        got = native.points_in_boxes_np(pts, boxes)
        # independent numpy check
        want = -np.ones(500, dtype=np.int64)
        for j, b in enumerate(boxes):
            rel = pts[:, :3] - b[:3]
            c, s = np.cos(b[6]), np.sin(b[6])
            lx = c * rel[:, 0] + s * rel[:, 1]
            ly = -s * rel[:, 0] + c * rel[:, 1]
            inside = (
                (np.abs(rel[:, 2]) <= b[5] / 2)
                & (np.abs(lx) < b[3] / 2 + 1e-5)
                & (np.abs(ly) < b[4] / 2 + 1e-5)
            )
            want[(want < 0) & inside] = j
        np.testing.assert_array_equal(got, want)
