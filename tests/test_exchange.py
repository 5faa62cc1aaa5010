import numpy as np
import pytest

from pcp_tpu.exchange import ExchangeDatabase
from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.utils.common_utils import create_logger
from test_datasets import load_data_cfg


class TestExchangeDatabase:
    def test_roundtrip(self, tmp_path, rng):
        db = ExchangeDatabase(tmp_path / "exch")
        modar = rng.normal(0, 1, (5, 9)).astype(np.float32)
        fg = rng.normal(0, 1, (20, 13)).astype(np.float32)
        db.save_modar("tok", 2, modar)
        db.save_foreground("tok", 2, fg)
        np.testing.assert_array_equal(db.load_modar("tok", 2), modar)
        np.testing.assert_array_equal(db.load_foreground("tok", 2), fg)
        assert db.load_modar("missing", 2) is None
        assert db.size_bytes("tok", 2, "modar") > 0


class TestGeneratorSplitCoverage:
    def test_generator_covers_both_splits(self, tmp_path):
        """The exchange DB generator must emit files for the TRAIN split, not
        just val: town 3 (si%3==0) is val, towns 4/5 are train. A generator
        that builds every split with training=False silently produces the val
        scenes twice and the ego then trains without MoDAR (regression)."""
        import importlib.util
        from pathlib import Path

        script = Path(__file__).resolve().parents[1] / "workspace/v2x_gen_exchange_database.py"
        spec = importlib.util.spec_from_file_location("genx", script)
        genx = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(genx)

        out = tmp_path / "exch"
        genx.gen_exchange_database(
            agent="car", synthetic=True, out_dir=out, max_batches=2,
            cfg_overrides={
                "SYNTHETIC": {"NUM_SCENES": 4, "KEYFRAMES_PER_SCENE": 2,
                              "NUM_CARS": 3, "NUM_PEDS": 0},
                "MAX_POINTS_PER_SAMPLE": 2048,
                "POINT_CLOUD_RANGE": [-12.8, -12.8, -8.0, 12.8, 12.8, 0.0],
                "MINI_TRAINVAL_STRIDE": 1,
                "DATASET_DOWNSAMPLING_RATIO": 1,
            },
        )
        scenes = {int(f.name.split("_")[0][5:]) for f in out.glob("*_modar.npz")}
        assert any(s % 3 != 0 for s in scenes), f"no TRAIN-split exchange files: {scenes}"
        assert any(s % 3 == 0 for s in scenes), f"no val-split exchange files: {scenes}"


class TestFlowPropagation:
    def test_modar_moves_by_twice_mean_flow(self, tmp_path, rng):
        """EGO dataset propagation: box center += 2 x mean flow of contained
        foreground points (v2x_sim_dataset_ego.py:196-215 semantics)."""
        cfg = load_data_cfg("v2x_sim_dataset_ego")
        ds, _, _ = build_dataloader(cfg, ["car"], batch_size=1, training=False,
                                    logger=create_logger(), workers=0)
        db = ds.exchange_database[2]
        db.directory = tmp_path
        box = np.array([[5.0, 3.0, -1.0, 4.0, 2.0, 1.6, 0.0, 0.9, 1.0]], np.float32)
        fg = np.zeros((8, 13), np.float32)
        fg[:, :3] = box[0, :3] + rng.normal(0, 0.3, (8, 3))
        fg[:, -3:] = [1.0, 0.5, 0.0]  # uniform flow
        db.save_modar("tokX", 2, box)
        db.save_foreground("tokX", 2, fg)
        out, n_fg = ds._load_and_propagate_modar("tokX", 2, propagate=True)
        assert n_fg == 8
        np.testing.assert_allclose(out[0, :3], box[0, :3] + 2 * np.array([1.0, 0.5, 0.0]),
                                   rtol=1e-5, atol=1e-5)
        # without propagation the box is unchanged
        out2, _ = ds._load_and_propagate_modar("tokX", 2, propagate=False)
        np.testing.assert_allclose(out2[0, :3], box[0, :3])

        # boxflow wire format (sender-side pooling) must propagate identically
        # and report zero foreground broadcast
        from pcp_tpu.exchange.database import pool_box_flow

        db.save_boxflow("tokX", 2, pool_box_flow(box, fg))
        out3, n_fg3 = ds._load_and_propagate_modar("tokX", 2, propagate=True)
        assert n_fg3 == 0
        np.testing.assert_allclose(out3, out, rtol=1e-5, atol=1e-5)
        out4, _ = ds._load_and_propagate_modar("tokX", 2, propagate=False)
        np.testing.assert_allclose(out4[0, :3], box[0, :3])

    def test_points_outside_box_ignored(self, tmp_path, rng):
        cfg = load_data_cfg("v2x_sim_dataset_ego")
        ds, _, _ = build_dataloader(cfg, ["car"], batch_size=1, training=False,
                                    logger=create_logger(), workers=0)
        db = ds.exchange_database[3]
        db.directory = tmp_path
        box = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0, 0.9, 1.0]], np.float32)
        fg = np.zeros((4, 13), np.float32)
        fg[:, :3] = [[50, 50, 0]] * 4  # far away
        fg[:, -3:] = 100.0
        db.save_modar("tokY", 3, box)
        db.save_foreground("tokY", 3, fg)
        out, _ = ds._load_and_propagate_modar("tokY", 3, propagate=True)
        np.testing.assert_allclose(out[0, :3], box[0, :3])
