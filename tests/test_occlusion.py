"""Synthetic-world occlusion: a nearer object shadows a farther one along the
same azimuth; a differently-positioned agent still sees it — the signal that
makes collaboration non-trivial."""
import numpy as np

from pcp_tpu.datasets.v2x_sim.source import SyntheticV2XSource


def _points_near(points, pos, radius=3.0):
    """Points near the box center at box height (excludes ground clutter)."""
    d = np.linalg.norm(points[:, :2] - pos[None, :2], axis=1)
    at_height = np.abs(points[:, 2] - pos[2]) < 1.5
    return int((d < radius)[at_height].sum() if at_height.any() else 0)


def test_nearer_object_shadows_farther():
    src = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=1)
    scene = src.scenes[0]
    pose = src._agent_pose(scene, 1, 0.0)
    sensor = pose[:3, 3]
    fwd = pose[:3, 0]  # agent +x axis in world

    dims = np.array([4.5, 2.0, 1.7])
    near_pos = sensor + fwd * 10.0
    far_pos = sensor + fwd * 22.0
    near_pos[2] = far_pos[2] = sensor[2] - 0.2
    objs = [
        (near_pos, 0.0, dims, "car", 0),
        (far_pos, 0.0, dims, "car", 1),
    ]
    pts = src._lidar_points_for_agent(scene, 0, 1, objs)
    world = (pose[:3, :3] @ pts[:, :3].T).T + sensor  # back to world frame
    assert _points_near(world, near_pos) > 20
    assert _points_near(world, far_pos) < 5  # shadowed

    # an agent far off-axis sees both
    side_sensor_pose = pose.copy()
    side = np.cross([0, 0, 1.0], fwd)
    side_sensor_pose[:3, 3] = sensor + side * 30.0

    def points_from(p):
        src2 = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=1)
        src2._agent_pose = lambda *a, **k: p
        return src2._lidar_points_for_agent(scene, 0, 1, objs), p

    pts2, p2 = points_from(side_sensor_pose)
    world2 = (p2[:3, :3] @ pts2[:, :3].T).T + p2[:3, 3]
    assert _points_near(world2, near_pos) > 8
    assert _points_near(world2, far_pos) > 8


def test_elevated_sensor_sees_over():
    """An RSU-height sensor is not blocked by a car at ground level."""
    src = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=1)
    scene = src.scenes[0]
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 6.0]  # high sensor
    src._agent_pose = lambda *a, **k: pose
    dims = np.array([4.5, 2.0, 1.7])
    objs = [
        (np.array([10.0, 0.0, -1.2]), 0.0, dims, "car", 0),
        (np.array([22.0, 0.0, -1.2]), 0.0, dims, "car", 1),
    ]
    pts = src._lidar_points_for_agent(scene, 0, 1, objs)
    world = pts[:, :3] + pose[:3, 3]  # identity rotation
    assert _points_near(world, objs[1][0]) > 20


def test_deterministic():
    a = SyntheticV2XSource(num_scenes=2, keyframes_per_scene=2)
    b = SyntheticV2XSource(num_scenes=2, keyframes_per_scene=2)
    ta = a.lidar_token(a.scenes[0], 1, 1)
    fa = a.get_frame(ta)
    fb = b.get_frame(ta)
    np.testing.assert_array_equal(fa["points"], fb["points"])


def test_visible_faces_break_box_symmetry():
    """VISIBLE_FACES=True: only sensor-facing box faces return points, so a
    static box's cloud is no longer 180-degree symmetric (heading direction
    becomes learnable, like real lidar)."""
    dims = np.array([4.5, 2.0, 1.7])
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 1.8]
    # box 15 m ahead on +x, heading +x: its -x face (rear, facing the sensor)
    # is at local x=-dx/2; its +x face (front, facing away) must be empty
    box_pos = np.array([15.0, 0.0, 0.5])
    objs = [(box_pos, 0.0, dims, "car", 0)]

    for vf, expect_far_face in ((False, True), (True, False)):
        src = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=1,
                                 visible_faces=vf)
        scene = src.scenes[0]
        src._agent_pose = lambda *a, **k: pose
        pts = src._lidar_points_for_agent(scene, 0, 1, objs)
        world = (pose[:3, :3] @ pts[:, :3].T).T + pose[:3, 3]
        local = world - box_pos[None, :]
        on_box = (np.abs(local[:, 0]) < dims[0] / 2 + 0.01) & \
                 (np.abs(local[:, 1]) < dims[1] / 2 + 0.01) & \
                 (np.abs(local[:, 2]) < dims[2] / 2 + 0.01)
        near_face = on_box & (local[:, 0] < -dims[0] / 2 + 0.02)
        far_face = on_box & (local[:, 0] > dims[0] / 2 - 0.02)
        assert near_face.sum() > 3, f"vf={vf}: sensor-facing face has no points"
        if expect_far_face:
            assert far_face.sum() > 3, "uniform sampling should hit both faces"
        else:
            assert far_face.sum() == 0, "visible-face sampling hit the far face"


def test_car_profile_breaks_heading_flip_symmetry():
    """A plain cuboid's surface cloud is EXACTLY invariant under a heading
    flip even with visible-face weighting (the flipped box's sensor-facing
    faces are congruent rectangles in the same world positions) — so static
    heading DIRECTION is unlearnable unless the shape itself is front/back
    asymmetric. The sedan-profile carve (car_profile) provides that: the
    theta-vs-theta+pi cloud distance must rise well above the resampling
    noise floor, while the plain-cuboid VF world must stay AT the floor
    (documents why visible faces alone cannot fix sender AOE)."""
    dims = np.array([4.5, 2.0, 1.7])
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 1.8]
    box_pos = np.array([15.0, 6.0, 0.5])

    def cloud(heading, kf0, car_profile):
        src = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=200,
                                 visible_faces=True, car_profile=car_profile)
        src._agent_pose = lambda *a, **k: pose
        objs = [(box_pos, heading, dims, "car", 0)]
        out = []
        for k in range(kf0, kf0 + 30):
            # vary the keyframe (not the agent id) to resample the cloud:
            # keyframes_per_scene=200 covers kf0+30 <= 130, and lid stays 0
            # so the draw matches a real agent-0 sample in any world mode
            pts = src._lidar_points_for_agent(src.scenes[0], k, 0, objs)
            world = (pose[:3, :3] @ pts[:, :3].T).T + pose[:3, 3]
            loc = world - box_pos
            on = ((np.abs(loc[:, 0]) < dims[0] / 2 + 0.05)
                  & (np.abs(loc[:, 1]) < dims[1] / 2 + 0.05)
                  & (np.abs(loc[:, 2]) < dims[2] / 2 + 0.05))
            out.append(loc[on])
        return np.concatenate(out)

    def hist(c):
        H, _ = np.histogramdd(c, bins=(10, 6, 6),
                              range=[[-2.5, 2.5], [-1.5, 1.5], [-1.0, 1.0]])
        return H / max(H.sum(), 1)

    for car_profile, expect_asymmetric in ((True, True), (False, False)):
        a = cloud(0.3, 0, car_profile)
        a2 = cloud(0.3, 100, car_profile)           # noise floor
        b = cloud(0.3 + np.pi, 0, car_profile)      # flipped heading
        floor = np.abs(hist(a) - hist(a2)).sum()
        flip = np.abs(hist(a) - hist(b)).sum()
        if expect_asymmetric:
            assert flip > 2.0 * floor, (flip, floor)
        else:
            assert flip < 1.5 * floor, (flip, floor)
