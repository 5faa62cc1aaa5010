"""Headless painters: render to PNG without a display."""
from pathlib import Path

import numpy as np

from workspace.visualization import (BEVPainter, PointsPainter,
                                     color_points_binary, get_boxes_vertices_coord)


def test_points_painter_renders(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (500, 3))
    boxes = np.array([[0, 0, 0, 4, 2, 1.6, 0.4], [5, 5, 0, 4, 2, 1.6, -0.8]])
    out = PointsPainter(pts, boxes).show(
        xyz_color=color_points_binary(rng.integers(0, 2, 500)),
        boxes_velo=np.array([[1.0, 0.5], [0.0, -1.0]]),
        special_points=pts[:5],
        save_to_path=str(tmp_path / "p.png"))
    assert Path(out).exists() and Path(out).stat().st_size > 1000


def test_bev_painter_renders(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (300, 3))
    painter = BEVPainter([-12, -12, -3, 12, 12, 1])
    painter.show_bev(pts,
                     gt_boxes=np.array([[0, 0, 0, 4, 2, 1.6, 0.3]]),
                     pred_boxes=np.array([[0.5, 0.2, 0, 4, 2, 1.6, 0.35]]),
                     save_to_path=str(tmp_path / "bev.png"))
    assert (tmp_path / "bev.png").stat().st_size > 1000


def test_vertices_match_corner_convention():
    boxes = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.0]])
    verts = get_boxes_vertices_coord(boxes)[0]
    assert verts.shape == (8, 3)
    np.testing.assert_allclose(verts[:, 2].min(), 0.5 - 0.75)
    np.testing.assert_allclose(verts[:, 2].max(), 0.5 + 0.75)
    np.testing.assert_allclose(np.abs(verts[:, 0] - 1.0).max(), 2.0)
