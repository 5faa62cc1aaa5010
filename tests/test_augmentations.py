"""Invariance tests for the per-object / frustum / pyramid augmentations."""
import numpy as np
import pytest

from pcp_tpu.datasets.augmentor import augmentor_utils as au


def _scene(rng, n_boxes=3, pts_per_box=60, n_bg=100):
    boxes = np.zeros((n_boxes, 7))
    boxes[:, 0] = np.arange(n_boxes) * 20.0  # far apart: no overlap
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = [4.0, 2.0, 1.5]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    pts = []
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (pts_per_box, 3)) * b[3:6] * 0.9
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.stack([
            local[:, 0] * c - local[:, 1] * s + b[0],
            local[:, 0] * s + local[:, 1] * c + b[1],
            local[:, 2] + b[2],
        ], axis=1)
        pts.append(world)
    bg = rng.uniform(-10, 10, (n_bg, 3)) + [0, 40.0, 0]  # outside all boxes
    pts = np.concatenate(pts + [bg])
    inten = rng.uniform(0, 1, (len(pts), 1))
    return boxes, np.hstack([pts, inten])


class TestLocalAugs:
    def test_local_translation_moves_box_points_together(self, rng):
        boxes, points = _scene(rng)
        bg_before = points[-100:].copy()
        b2, p2 = au.random_local_translation(boxes.copy(), points.copy(), [0.5, 1.5], ["x", "y"])
        # background untouched
        np.testing.assert_array_equal(p2[-100:], bg_before)
        # each box's points still inside the (moved) box
        for i in range(len(b2)):
            m = au.points_in_box_mask(p2, b2[i])
            assert m[:180].reshape(3, 60)[i].all()

    def test_local_rotation_preserves_membership_and_radius(self, rng):
        boxes, points = _scene(rng)
        b2, p2 = au.local_rotation(boxes.copy(), points.copy(), [-0.7, 0.7])
        for i in range(len(b2)):
            m = au.points_in_box_mask(p2, b2[i])
            assert m[:180].reshape(3, 60)[i].all()
        # distance of each point to its box center is preserved
        for i in range(3):
            d0 = np.linalg.norm(points[i * 60 : (i + 1) * 60, :3] - boxes[i, :3], axis=1)
            d1 = np.linalg.norm(p2[i * 60 : (i + 1) * 60, :3] - b2[i, :3], axis=1)
            np.testing.assert_allclose(d0, d1, rtol=1e-6)

    def test_local_scaling_scales_distances(self, rng):
        boxes, points = _scene(rng)
        np.random.seed(3)
        b2, p2 = au.local_scaling(boxes.copy(), points.copy(), [1.1, 1.3])
        # per-box scale is random in [1.1, 1.3]; recover it from the dims and
        # check the points scaled by the same factor about the center
        for i in range(3):
            sc = b2[i, 3] / boxes[i, 3]
            assert 1.1 <= sc <= 1.3
            d0 = np.linalg.norm(points[i * 60 : (i + 1) * 60, :3] - boxes[i, :3], axis=1)
            d1 = np.linalg.norm(p2[i * 60 : (i + 1) * 60, :3] - b2[i, :3], axis=1)
            np.testing.assert_allclose(d1, d0 * sc, rtol=1e-5)


class TestFrustumDropout:
    def test_global_top_removes_high_points(self, rng):
        boxes, points = _scene(rng)
        np.random.seed(0)
        b2, p2 = au.global_frustum_dropout(boxes.copy(), points.copy(), [0.3, 0.3], "top")
        zmax, zmin = points[:, 2].max(), points[:, 2].min()
        thr = zmax - 0.3 * (zmax - zmin)
        assert (p2[:, 2] < thr).all()
        assert len(p2) < len(points)

    def test_local_bottom_removes_only_in_box(self, rng):
        boxes, points = _scene(rng)
        np.random.seed(0)
        b2, p2 = au.local_frustum_dropout(boxes.copy(), points.copy(), [0.4, 0.4], "bottom")
        # background survives untouched
        assert len(p2) >= 100
        np.testing.assert_array_equal(p2[-100:], points[-100:])


class TestPyramidAug:
    def test_pyramid_partition_covers_box(self, rng):
        boxes, points = _scene(rng)
        total = np.zeros(len(points), dtype=int)
        for pid in range(6):
            total += au.points_in_pyramid_mask(points, boxes[0], pid)
        inside = au.points_in_box_mask(points, boxes[0])
        # every strictly-inside point belongs to exactly one pyramid
        strict = np.abs(au._local_coords(points, boxes[0])).max(axis=1) < 0.999
        assert (total[strict & inside] == 1).all()
        assert (total[~inside] == 0).sum() == (~inside).sum()

    def test_dropout_removes_a_pyramid(self, rng):
        boxes, points = _scene(rng)
        np.random.seed(1)
        b2, p2, keep = au.local_pyramid_dropout(boxes.copy(), points.copy(), 1.0)
        assert (~keep).all()
        assert len(p2) < len(points)

    def test_sparsify_caps_pyramid_points(self, rng):
        boxes, points = _scene(rng)
        np.random.seed(2)
        keep = np.ones(len(boxes), dtype=bool)
        b2, p2, keep2 = au.local_pyramid_sparsify(boxes.copy(), points.copy(), 1.0, 3, keep)
        assert len(p2) <= len(points)

    def test_swap_preserves_counts_and_membership(self, rng):
        boxes, points = _scene(rng, n_boxes=2, pts_per_box=120)
        np.random.seed(4)
        keep = np.ones(2, dtype=bool)
        b2, p2 = au.local_pyramid_swap(boxes.copy(), points.copy(), 1.0, 5, keep)
        assert len(p2) == len(points)  # swap moves, never drops
        np.testing.assert_array_equal(b2, boxes)
        # swapped points land inside the destination boxes
        in_any = au.points_in_box_mask(p2, b2[0]) | au.points_in_box_mask(p2, b2[1])
        assert in_any.sum() >= 200


class TestImgMapAugs:
    def test_flip_x_flips_rows(self, rng):
        img = rng.uniform(0, 1, (5, 16, 16))
        d = {"gt_boxes": np.zeros((1, 7)), "points": np.zeros((1, 4)), "img_map": img.copy()}
        au.random_flip_along_x(d, enable=True)
        np.testing.assert_array_equal(d["img_map"], img[:, ::-1])

    def test_rotation_rotates_raster(self, rng):
        img = np.zeros((5, 32, 32))
        img[0, 16, 24] = 1.0
        d = {"gt_boxes": np.zeros((1, 7)), "points": np.zeros((1, 4)), "img_map": img.copy()}
        au.global_rotation(d, None, noise_rotation=np.pi / 2)
        # cv2 rotates the raster by the same angle; the hot pixel moves
        assert d["img_map"][0, 16, 24] == 0.0
        assert d["img_map"][0].sum() > 0
