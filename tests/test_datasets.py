import numpy as np
import pytest

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.datasets.v2x_sim.source import SyntheticV2XSource
from pcp_tpu.datasets.v2x_sim.v2x_sim_utils import (
    get_pseudo_sweeps_of_1lidar,
    correction_numpy,
)
from pcp_tpu.utils.common_utils import create_logger


def load_data_cfg(name, **overrides):
    cfg = CfgDict()
    cfg_from_yaml_file(f"tools/cfgs/dataset_configs/{name}.yaml", cfg)
    cfg.update({"USE_SYNTHETIC_DATA": True, "MAX_POINTS_PER_SAMPLE": 16384})
    cfg["SYNTHETIC"] = {"NUM_SCENES": 3, "KEYFRAMES_PER_SCENE": 4, "NUM_CARS": 12, "NUM_PEDS": 4}
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


@pytest.fixture(scope="module")
def source():
    return SyntheticV2XSource(num_scenes=3, keyframes_per_scene=4, num_cars=12, num_peds=4)


class TestPseudoSweeps:
    def test_output_format(self, source):
        token = source.lidar_token(source.scenes[0], 2, 0)
        out = get_pseudo_sweeps_of_1lidar(source, token, 10, ("car", "pedestrian"),
                                          threshold_boxes_by_points=5)
        pts = out["points"]
        assert pts.shape[1] == 7
        n_inst = out["gt_boxes"].shape[0]
        assert out["instances_tf"].shape == (n_inst, 11, 4, 4)
        assert out["gt_names"].shape == (n_inst,)
        # sweep indices within range; background has inst_idx -1
        assert pts[:, -2].max() <= 10
        bg = pts[pts[:, -1] < 0]
        assert np.all(bg[:, -2] == 10)

    def test_correction_restores_current_position(self, source):
        """Applying instances_tf to historical foreground points must land them
        on the current-sweep footprint (the correction is exact by construction)."""
        token = source.lidar_token(source.scenes[0], 3, 1)
        out = get_pseudo_sweeps_of_1lidar(source, token, 10, ("car",),
                                          threshold_boxes_by_points=5)
        pts = out["points"]
        fg = pts[pts[:, -1] >= 0]
        if fg.shape[0] == 0:
            pytest.skip("no foreground in this synthetic frame")
        corrected = correction_numpy(fg, out["instances_tf"])
        # current-sweep points of each instance == corrected historical points sets
        cur = fg[fg[:, -2] == 10]
        for inst in np.unique(fg[:, -1]).astype(int):
            m_inst = fg[:, -1] == inst
            cur_inst = cur[cur[:, -1] == inst][:, :3]
            corr_inst = corrected[m_inst]
            # every corrected point must coincide with some current point
            d = np.linalg.norm(corr_inst[:, None, :] - cur_inst[None, :, :], axis=-1).min(axis=1)
            assert d.max() < 1e-3


class TestV2XDatasets:
    def test_rsu_dataset_batch(self):
        cfg = load_data_cfg("v2x_sim_dataset_rsu")
        ds, loader, _ = build_dataloader(cfg, ["car"], batch_size=2, training=True,
                                         logger=create_logger(), workers=0, seed=0)
        assert len(ds) > 0
        batch = next(iter(loader))
        assert batch["points"].shape[0] == 2
        assert batch["points"].shape[2] == 7  # encoded features
        assert batch["points_mask"].dtype == bool
        assert batch["gt_boxes"].shape[2] == 8  # box7 + class
        assert "instances_tf" in batch

    def test_ego_dataset_13features(self):
        cfg = load_data_cfg("v2x_sim_dataset_ego")
        cfg.update({"USE_GT_FROM_EVERY_AGENT": True, "EVAL_FILTER_GT_BEYOND_RANGE": 60.0,
                    "EXCHANGE_MODAR": True, "EXCHANGE_NOW": False})
        ds, loader, _ = build_dataloader(cfg, ["car"], batch_size=2, training=False,
                                         logger=create_logger(), workers=0, seed=0)
        batch = next(iter(loader))
        assert batch["points"].shape[2] == 13
        # merged gt from all agents exists
        assert batch["gt_boxes"].shape[2] == 8
        meta = batch["metadata"][0]
        assert "exchange" in meta

    def test_early_dataset_concats_agents(self):
        cfg = load_data_cfg("v2x_sim_dataset_ego_early", MAX_POINTS_PER_SAMPLE=120000)
        ds, loader, _ = build_dataloader(cfg, ["car"], batch_size=1, training=False,
                                         logger=create_logger(), workers=0, seed=0)
        batch = next(iter(loader))
        meta = batch["metadata"][0]
        # other agents contributed points
        assert sum(meta["exchange"].values()) > 0
        assert batch["points_mask"][0].sum() > meta["num_original"]

    def test_train_loader_augments(self):
        cfg = load_data_cfg("v2x_sim_dataset_rsu")
        ds, loader, _ = build_dataloader(cfg, ["car"], batch_size=2, training=True,
                                         logger=create_logger(), workers=0, seed=1)
        batch = next(iter(loader))
        assert "noise_rot" in batch or "flip_x" in batch


class TestMetricSelfCheck:
    def test_oracle_gt_as_predictions(self):
        """Feeding GT as predictions must give ~perfect mAP (the reference's
        test_v2x_dataset_eval.py pattern)."""
        cfg = load_data_cfg("v2x_sim_dataset_rsu")
        ds, _, _ = build_dataloader(cfg, ["car"], batch_size=1, training=False,
                                    logger=create_logger(), workers=0)
        det_annos = []
        for info in ds.infos:
            frame = ds.source.get_frame(info["lidar_token"], classes_of_interest=("car",),
                                        threshold_boxes_by_points=5)
            det_annos.append({
                "boxes_lidar": frame["boxes"],
                "score": np.ones(frame["boxes"].shape[0]),
                "pred_labels": np.ones(frame["boxes"].shape[0], dtype=np.int64),
                "name": frame["names"],
                "metadata": {"lidar_token": info["lidar_token"]},
            })
        result_str, result_dict = ds.evaluation(det_annos, ["car"], eval_metric="nuscenes")
        assert result_dict["mAP"] > 0.99, result_str

    def test_random_predictions_score_zero(self):
        cfg = load_data_cfg("v2x_sim_dataset_rsu")
        ds, _, _ = build_dataloader(cfg, ["car"], batch_size=1, training=False,
                                    logger=create_logger(), workers=0)
        rng = np.random.default_rng(0)
        det_annos = []
        for info in ds.infos:
            boxes = np.zeros((10, 7))
            boxes[:, :2] = rng.uniform(200, 300, size=(10, 2))  # far from everything
            boxes[:, 3:6] = 2.0
            det_annos.append({
                "boxes_lidar": boxes,
                "score": rng.uniform(0.1, 1.0, 10),
                "pred_labels": np.ones(10, dtype=np.int64),
                "name": np.array(["car"] * 10),
                "metadata": {"lidar_token": info["lidar_token"]},
            })
        _, result_dict = ds.evaluation(det_annos, ["car"], eval_metric="nuscenes")
        assert result_dict["mAP"] < 0.01
