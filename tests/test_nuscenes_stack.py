"""nuScenes pretraining stack: HD-map raster core + pointpillar_jr configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.datasets.nuscenes.map_utils import (
    draw_lane_in_bev,
    interpolate_map_at_points,
    make_map_representation,
    map_lanes_to_sensor,
    put_in_2pi,
    rasterize_polygons,
)

PC_RANGE = (-12.8, -12.8, -5.0, 12.8, 12.8, 3.0)
RES = 0.2
SIZE = 128


class TestLaneGeometry:
    def test_put_in_2pi(self):
        out = put_in_2pi(np.array([-np.pi, -0.5, 0.0, 1.0, 3.0]))
        assert (out >= 0).all() and (out < 2 * np.pi + 1e-6).all()
        assert out[1] == pytest.approx(2 * np.pi - 0.5)

    def test_lanes_to_sensor_rotation(self):
        # sensor rotated +90deg about z at (10, 0): a lane heading east in
        # global becomes heading -90deg (south) in sensor frame
        yaw_s = np.pi / 2
        g2s = np.eye(4)
        c, s = np.cos(-yaw_s), np.sin(-yaw_s)
        g2s[:2, :2] = [[c, -s], [s, c]]
        g2s[:2, 3] = g2s[:2, :2] @ [-10.0, 0.0]
        lanes = {"a": np.array([[10.0, 0.0, 0.0], [12.0, 0.0, 0.0]])}
        out = map_lanes_to_sensor(g2s, lanes)["a"]
        assert out[0, :2] == pytest.approx([0.0, 0.0], abs=1e-9)
        assert out[1, :2] == pytest.approx([0.0, -2.0], abs=1e-9)
        assert out[0, 2] == pytest.approx(2 * np.pi - np.pi / 2, abs=1e-9)

    def test_draw_lane_paints_direction(self):
        lanes = {"l": np.array([[-5.0, 0.0, 1.0], [5.0, 0.0, 1.0]])}
        img = draw_lane_in_bev(lanes, PC_RANGE, RES, (SIZE, SIZE))
        cy = cx = int((0.0 - PC_RANGE[0]) / RES)
        assert img[cy, cx] == pytest.approx(1.0, abs=1e-6)
        assert img[5, 5] == 0.0

    def test_draw_lane_normalized(self):
        lanes = {"l": np.array([[-5.0, 0.0, np.pi], [5.0, 0.0, np.pi]])}
        img = draw_lane_in_bev(lanes, PC_RANGE, RES, (SIZE, SIZE), normalize_lane_angle=True)
        cy = cx = SIZE // 2
        assert 0 < img[cy, cx] <= 0.5 + 1e-6


class TestPolygonRaster:
    def test_square_fill_area(self):
        poly = np.array([[-4.0, -4.0], [4.0, -4.0], [4.0, 4.0], [-4.0, 4.0]])
        img = rasterize_polygons([poly], PC_RANGE, RES, (SIZE, SIZE))
        want_px = (8.0 / RES) ** 2
        assert img.sum() == pytest.approx(want_px, rel=0.06)
        assert img[SIZE // 2, SIZE // 2] == 1.0
        assert img[2, 2] == 0.0


class TestRepresentation:
    def test_five_channel_stack(self):
        layers = {"drivable_area": [np.array([[-8, -8], [8, -8], [8, 8], [-8, 8]], float)]}
        lanes = {"l": np.array([[0.0, -6.0, 0.5], [0.0, 6.0, 0.5]])}
        rep = make_map_representation(layers, lanes, np.eye(4), PC_RANGE, RES)
        assert rep.shape == (5, SIZE, SIZE)
        assert rep[0].sum() > 0  # drivable
        assert rep[1].sum() == 0  # ped_crossing absent
        assert rep[4].max() > 0  # lane dir

    def test_interpolate_at_points(self):
        img = np.zeros((5, SIZE, SIZE), np.float32)
        img[2, 64, 70] = 1.0  # walkway at pixel (x=70, y=64)
        pts = np.array([
            [70 * RES + PC_RANGE[0] + 0.1, 64 * RES + PC_RANGE[1] + 0.1, 0.0],
            [0.0, 0.0, 0.0],
            [99.0, 99.0, 0.0],  # out of range
        ])
        feats = interpolate_map_at_points(img, pts, PC_RANGE, RES)
        assert feats.shape == (3, 5)
        assert feats[0, 2] == 1.0
        assert feats[1].sum() == 0.0
        assert feats[2].sum() == 0.0


class TestJrConfigsBuild:
    @pytest.mark.parametrize("cfg_name", [
        "pointpillar_jr_nomap",
        "pointpillar_jr_withmap",
        "pointpillar_jr_corr_withmap",
    ])
    def test_config_builds_and_forwards(self, cfg_name):
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network
        from pcp_tpu.models.detectors.detector_template import DatasetInfo

        cfg = CfgDict()
        cfg_from_yaml_file(f"tools/cfgs/nuscenes_models/{cfg_name}.yaml", cfg)
        n_feat = len(cfg.DATA_CONFIG.POINT_FEATURE_ENCODING["used_feature_list"])
        info = DatasetInfo(
            class_names=tuple(cfg.CLASS_NAMES), num_point_features=n_feat,
            point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
            voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1),
        )
        model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset_info=info)
        rng = np.random.default_rng(0)
        b, n = 1, 1024
        pts = rng.uniform(-12, 12, (b, n, n_feat)).astype(np.float32)
        pts[..., 3] = rng.uniform(0, 1, (b, n))
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.ones((b, n), bool),
            "batch_size": b,
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        fbd = out["final_box_dicts"]
        post = int(cfg.MODEL.DENSE_HEAD.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE)
        n_heads = len(cfg.MODEL.DENSE_HEAD.CLASS_NAMES_EACH_HEAD)
        assert fbd["pred_boxes"].shape[1] == post * n_heads
        assert np.isfinite(np.asarray(fbd["pred_scores"])).all()

    def test_jr_train_step_with_velocity_and_iou(self):
        """The withmap config trains: vel channels from gt velocity and the
        predicted-IoU calibration target in the last reg channel."""
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network
        from pcp_tpu.models.detectors.detector_template import DatasetInfo

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/nuscenes_models/pointpillar_jr_withmap.yaml", cfg)
        n_feat = len(cfg.DATA_CONFIG.POINT_FEATURE_ENCODING["used_feature_list"])
        info = DatasetInfo(
            class_names=tuple(cfg.CLASS_NAMES), num_point_features=n_feat,
            point_cloud_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
            voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1),
        )
        model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset_info=info)
        rng = np.random.default_rng(0)
        b, n, m = 1, 1024, 500
        pts = rng.uniform(-12, 12, (b, n, n_feat)).astype(np.float32)
        gt = np.zeros((b, m, 10), dtype=np.float32)  # box7 + vel2 + cls
        gt[:, :4, 0:2] = rng.uniform(-10, 10, (b, 4, 2))
        gt[:, :4, 3:6] = [4.2, 1.8, 1.6]
        gt[:, :4, 7:9] = rng.normal(0, 2, (b, 4, 2))
        gt[:, :4, 9] = 1.0
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.ones((b, n), bool),
            "gt_boxes": jnp.asarray(gt),
            "batch_size": b,
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch, train=True, mutable=["batch_stats"],
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        # target width must match the 11-channel HEAD_ORDER concat
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
        assert out["head_targets"][0]["target_boxes"].shape[-1] == 11
