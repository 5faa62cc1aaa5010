"""Instance-centric sweep assembly: correction transforms must push each
historical pose onto the latest one, points get the right instance tags."""
import numpy as np

from pcp_tpu.datasets.nuscenes.temporal_utils import (
    build_instance_centric_sample, remove_ego_vehicle_points)


def _pose(x, y, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = [x, y, 0.0]
    return m


def test_instances_tf_corrects_history():
    # one car moving +x at 1 m/sweep, rotating slightly
    n_sweeps = 4
    sweep_points, sweep_boxes = [], []
    for s in range(3):
        x = float(s)
        box = np.array([x, 0.0, 0.0, 4.0, 2.0, 1.6, 0.1 * s])
        pts = np.array([[x + 0.5, 0.2, 0.0, 0.5, 0.1 * (2 - s), s]])
        sweep_points.append(pts)
        sweep_boxes.append({"carA": box})
    out = build_instance_centric_sample(sweep_points, sweep_boxes, n_sweeps)

    tf = out["instances_tf"]
    assert tf.shape == (1, n_sweeps, 4, 4)
    # applying tf[0, s] to the historical pose yields the LAST pose
    last = _pose(2.0, 0.0, 0.2)
    for s in range(3):
        hist = _pose(float(s), 0.0, 0.1 * s)
        np.testing.assert_allclose(tf[0, s] @ hist, last, atol=1e-9)
    # unused sweep slots stay zero
    np.testing.assert_allclose(tf[0, 3], 0.0)
    # latest box has the last pose
    np.testing.assert_allclose(out["gt_boxes"][0, :3], [2.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(out["gt_boxes"][0, 6], 0.2, atol=1e-9)
    # all three points are inside their sweep's box -> tagged instance 0
    assert (out["points"][:, -1] == 0).all()


def test_background_points_tagged_minus_one():
    sweep_points = [np.array([[50.0, 50.0, 0.0, 1.0, 0.0, 0]])]
    sweep_boxes = [{"a": np.array([0.0, 0, 0, 4, 2, 1.6, 0.0])}]
    out = build_instance_centric_sample(sweep_points, sweep_boxes, 2)
    assert out["points"][0, -1] == -1


def test_two_instances_distinct_ids():
    boxes0 = {"a": np.array([0.0, 0, 0, 4, 2, 1.6, 0.0]),
              "b": np.array([10.0, 0, 0, 4, 2, 1.6, 0.0])}
    pts = np.array([[0.1, 0, 0, 1, 0, 0], [10.1, 0, 0, 1, 0, 0]])
    out = build_instance_centric_sample([pts], [boxes0], 2)
    assert out["instances_tf"].shape[0] == 2
    assert set(out["points"][:, -1].astype(int)) == {0, 1}


def test_no_instances_empty_outputs():
    out = build_instance_centric_sample(
        [np.array([[1.0, 2, 0, 1, 0, 0]])], [{}], 3)
    assert out["instances_tf"].shape == (0, 3, 4, 4)
    assert out["points"].shape[1] == 7
    assert out["points"][0, -1] == -1


def test_remove_ego_points():
    pts = np.array([[0.5, 0.5, 0, 1, 0, 0], [5.0, 5.0, 0, 1, 0, 0]])
    kept = remove_ego_vehicle_points(pts, center_radius=2.0)
    assert kept.shape[0] == 1 and kept[0, 0] == 5.0
