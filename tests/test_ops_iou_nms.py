import numpy as np
import jax.numpy as jnp
import pytest

from pcp_tpu.ops import (
    boxes_overlap_bev,
    boxes_iou_bev,
    boxes_iou3d,
    nms_bev,
    points_in_boxes,
    points_in_boxes_mask,
)
from reference_impls import overlap_bev_ref, iou_bev_ref, iou_3d_ref, greedy_nms_ref


def random_boxes(rng, n, scale=20.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-scale, scale, size=(n, 2))
    boxes[:, 2] = rng.uniform(-2, 0, size=n)
    boxes[:, 3:5] = rng.uniform(1.0, 6.0, size=(n, 2))
    boxes[:, 5] = rng.uniform(1.0, 3.0, size=n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    return boxes


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(b), jnp.asarray(b)))
        assert iou[0, 0] == pytest.approx(1.0, abs=1e-4)

    def test_disjoint_boxes(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[10, 10, 0, 2, 2, 2, 1.0]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        assert iou[0, 0] == pytest.approx(0.0, abs=1e-6)

    def test_axis_aligned_half_overlap(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[1, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        ov = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        assert ov[0, 0] == pytest.approx(2.0, abs=1e-4)  # 1 x 2 strip

    def test_rotated_45_cross(self):
        # unit square vs same square rotated 45 deg: overlap is a regular octagon
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[0, 0, 0, 2, 2, 2, np.pi / 4]], dtype=np.float32)
        ov = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        expected = 8 * (np.sqrt(2) - 1)  # octagon area for side-2 squares
        assert ov[0, 0] == pytest.approx(expected, rel=1e-3)

    def test_contained_box(self):
        a = np.array([[0, 0, 0, 10, 10, 4, 0.7]], dtype=np.float32)
        b = np.array([[0.5, -0.5, 0, 2, 1, 1, -1.2]], dtype=np.float32)
        ov = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        assert ov[0, 0] == pytest.approx(2.0, rel=1e-3)

    def test_differential_random(self, rng):
        boxes_a = random_boxes(rng, 24)
        boxes_b = random_boxes(rng, 24)
        got = np.asarray(boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
        for i in range(boxes_a.shape[0]):
            for j in range(boxes_b.shape[0]):
                want = overlap_bev_ref(boxes_a[i].astype(np.float64), boxes_b[j].astype(np.float64))
                assert got[i, j] == pytest.approx(want, abs=2e-2), (i, j)

    def test_differential_dense_cluster(self, rng):
        # heavily overlapping cluster stresses intersection branches
        boxes = random_boxes(rng, 32, scale=3.0)
        got = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
        for i in range(8):
            for j in range(8):
                want = iou_bev_ref(boxes[i].astype(np.float64), boxes[j].astype(np.float64))
                assert got[i, j] == pytest.approx(want, abs=2e-2)

    def test_iou3d_matches_reference(self, rng):
        boxes_a = random_boxes(rng, 12, scale=4.0)
        boxes_b = random_boxes(rng, 12, scale=4.0)
        got = np.asarray(boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
        for i in range(12):
            for j in range(12):
                want = iou_3d_ref(boxes_a[i].astype(np.float64), boxes_b[j].astype(np.float64))
                assert got[i, j] == pytest.approx(want, abs=2e-2)


class TestNMS:
    def test_matches_greedy_reference(self, rng):
        boxes = random_boxes(rng, 64, scale=8.0)
        scores = rng.uniform(0.1, 1.0, size=64).astype(np.float32)
        valid = np.ones(64, dtype=bool)
        keep_idx, keep_count = nms_bev(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=64
        )
        got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
        want = greedy_nms_ref(boxes.astype(np.float64), scores, 0.2)
        assert got == want
        assert int(keep_count) == len(want)

    def test_padding_never_kept(self, rng):
        boxes = random_boxes(rng, 16)
        scores = rng.uniform(0.5, 1.0, size=16).astype(np.float32)
        valid = np.zeros(16, dtype=bool)
        valid[:4] = True
        keep_idx, keep_count = nms_bev(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=16
        )
        kept = set(int(i) for i in np.asarray(keep_idx) if i >= 0)
        assert kept.issubset({0, 1, 2, 3})

    def test_post_max_size_cap(self, rng):
        boxes = random_boxes(rng, 32, scale=100.0)  # spread out: nothing suppressed
        scores = rng.uniform(0.1, 1.0, size=32).astype(np.float32)
        valid = np.ones(32, dtype=bool)
        keep_idx, keep_count = nms_bev(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=5
        )
        assert int(keep_count) == 5
        assert (np.asarray(keep_idx) >= 0).sum() == 5
        # highest-scoring 5 kept
        want = set(np.argsort(-scores)[:5].tolist())
        assert set(np.asarray(keep_idx).tolist()) == want


class TestPointsInBoxes:
    def test_basic_containment(self):
        boxes = np.array([[0, 0, 0, 4, 2, 2, 0.0], [10, 0, 0, 2, 2, 2, np.pi / 2]], dtype=np.float32)
        pts = np.array(
            [
                [0.0, 0.0, 0.0],     # in box 0
                [1.9, 0.9, 0.9],     # in box 0 (corner)
                [2.5, 0.0, 0.0],     # outside
                [10.0, 0.5, 0.0],    # in box 1
                [0.0, 0.0, 1.5],     # above box 0
            ],
            dtype=np.float32,
        )
        idx = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
        assert idx.tolist() == [0, 0, -1, 1, -1]

    def test_rotated_box(self):
        yaw = np.pi / 4
        boxes = np.array([[0, 0, 0, 4, 1, 2, yaw]], dtype=np.float32)
        # a point along the rotated long axis is inside; same point unrotated is not
        p_along = np.array([[1.8 * np.cos(yaw), 1.8 * np.sin(yaw), 0.0]], dtype=np.float32)
        p_off = np.array([[1.8, 0.0, 0.0]], dtype=np.float32)
        m = np.asarray(points_in_boxes_mask(jnp.asarray(np.vstack([p_along, p_off])), jnp.asarray(boxes)))
        assert m[0, 0] and not m[1, 0]


class TestNMSMask:
    def test_index_zero_kept_with_padding(self):
        """Regression: padding keep_idx rows (-1) must not clobber the mask
        entry for input index 0 (ADVICE r1, medium)."""
        from pcp_tpu.ops.nms import nms_bev_mask

        boxes = np.zeros((2, 7), dtype=np.float32)
        boxes[0, 0:2] = [0.0, 0.0]
        boxes[1, 0:2] = [30.0, 30.0]  # disjoint: both survive
        boxes[:, 3:6] = [4.0, 2.0, 1.5]
        scores = np.array([0.9, 0.8], dtype=np.float32)
        valid = np.ones(2, dtype=bool)
        mask = np.asarray(
            nms_bev_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=83)
        )
        assert mask.tolist() == [True, True]

    def test_mask_matches_idx(self, rng):
        from pcp_tpu.ops.nms import nms_bev_mask

        boxes = random_boxes(rng, 32, scale=10.0)
        scores = rng.uniform(0.1, 1.0, size=32).astype(np.float32)
        valid = np.ones(32, dtype=bool)
        keep_idx, _ = nms_bev(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=32
        )
        mask = np.asarray(
            nms_bev_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2, post_max_size=32)
        )
        want = np.zeros(32, dtype=bool)
        want[[int(i) for i in np.asarray(keep_idx) if i >= 0]] = True
        assert (mask == want).all()
