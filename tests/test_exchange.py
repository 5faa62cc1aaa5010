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


class TestWeightedNMS:
    def test_cluster_geometry_is_score_weighted(self):
        from pcp_tpu.utils.nms_np import weighted_nms_bev_np

        boxes = np.array([
            [0.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0],
            [0.5, 0.2, -0.9, 4.2, 2.1, 1.6, 0.05],   # same object, offset
            [20.0, 0.0, -1.0, 4.0, 2.0, 1.6, 1.0],   # separate object
        ])
        scores = np.array([0.9, 0.3, 0.8])
        fused, keep = weighted_nms_bev_np(boxes, scores, thresh=0.2)
        assert list(keep) == [0, 2]
        w = scores[:2] / scores[:2].sum()
        np.testing.assert_allclose(fused[0, :6], (w[:, None] * boxes[:2, :6]).sum(0), atol=1e-9)
        assert 0.0 < fused[0, 6] < 0.05
        np.testing.assert_allclose(fused[1], boxes[2])

    def test_opposed_heading_flipped_before_average(self):
        from pcp_tpu.utils.nms_np import weighted_nms_bev_np

        boxes = np.array([
            [0.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0],
            [0.1, 0.0, -1.0, 4.0, 2.0, 1.6, np.pi + 0.1],  # opposed duplicate
        ])
        fused, keep = weighted_nms_bev_np(boxes, np.array([0.9, 0.9]), 0.2)
        assert len(keep) == 1
        # pi-flipped to 0.1, averaged with 0.0 -> ~0.05 (NOT ~pi/2)
        assert abs(fused[0, 6] - 0.05) < 1e-6


class TestExchangeAblationLevers:
    def _ego_ds(self, **over):
        cfg = load_data_cfg("v2x_sim_dataset_ego")
        cfg.update({
            "SYNTHETIC": {"NUM_SCENES": 4, "KEYFRAMES_PER_SCENE": 3,
                          "NUM_CARS": 6, "NUM_PEDS": 0, "WORLD": "urban"},
            "MAX_POINTS_PER_SAMPLE": 4096,
            "MINI_TRAINVAL_STRIDE": 1,
            "DATASET_DOWNSAMPLING_RATIO": 1,
        })
        cfg.update(over)
        ds, _, _ = build_dataloader(cfg, ["car"], batch_size=1, training=over.get("_training", True),
                                    logger=create_logger(), workers=0)
        return ds

    def test_oracle_boxflow_propagates_exactly(self):
        """EXCHANGE_ORACLE: boxflow = sender GT + half-keyframe flow, so the
        x2.0 propagation advances each box by exactly v * KEYFRAME_DT — the
        propagated box must coincide with that agent's GT at the NEXT keyframe
        (constant-velocity world)."""
        ds = self._ego_ds(EXCHANGE_ORACLE=True)
        src = ds.source
        # a MID-SEQUENCE keyframe (prev and next both exist): at keyframe 0
        # the flow horizon clamps to t=0 and the oracle flow is legitimately
        # zero (same limitation as the real pipeline - no history, no flow)
        tok0 = [i["token"] for i in ds.infos
                if src.sample_record(i["token"])["prev"] != ""
                and src.sample_record(i["token"])["next"] != ""][0]
        s0 = src.sample_record(tok0)
        s1 = src.sample_record(s0["next"])
        lt0 = s0["data"]["LIDAR_TOP_id_0"]
        lt1 = s1["data"]["LIDAR_TOP_id_0"]
        modar, n_fg = ds._load_and_propagate_modar(tok0, 0, propagate=True, lidar_token=lt0)
        assert n_fg == 0 and modar.shape[0] > 0
        f1 = src.get_frame(lt1, classes_of_interest=("car",), threshold_boxes_by_points=None)
        # RSU is static -> frames share the lidar frame; match by instance order
        f0 = src.get_frame(lt0, classes_of_interest=("car",), threshold_boxes_by_points=None)
        iid_to_next = {i: b for i, b in zip(f1["instance_ids"], f1["boxes"])}
        f0_iids = [i for i in f0["instance_ids"]]
        # oracle rows follow f0 (thresholded >=1pt) order; check each
        # propagated center appears among next-frame GT centers
        next_centers = f1["boxes"][:, :2]
        for row in modar:
            d = np.linalg.norm(next_centers - row[None, :2], axis=1).min()
            assert d < 0.3, f"propagated oracle box {row[:2]} not at next-frame GT (min d={d})"

    def test_oracle_flow_moves_predicted_box_by_gt_velocity(self, tmp_path):
        ds = self._ego_ds(EXCHANGE_ORACLE_FLOW=True)
        src = ds.source
        tok0 = [i["token"] for i in ds.infos if src.sample_record(i["token"])["prev"] == ""][0]
        s0 = src.sample_record(tok0)
        lt0 = s0["data"]["LIDAR_TOP_id_0"]
        f0 = src.get_frame(lt0, classes_of_interest=("car",), threshold_boxes_by_points=1)
        assert f0["boxes"].shape[0] > 0
        gt = f0["boxes"][0]
        vel_dt = gt[:3] - f0["prev_boxes"][0, :3]  # displacement per keyframe
        db = ds.exchange_database[0]
        db.directory = tmp_path
        pred = np.concatenate([gt[:7] + 0.1, [0.7], [1.0]])[None].astype(np.float32)
        db.save_modar(tok0, 0, pred)
        out, _ = ds._load_and_propagate_modar(tok0, 0, propagate=True, lidar_token=lt0)
        np.testing.assert_allclose(out[0, :3], pred[0, :3] + vel_dt, atol=1e-6)
        # and without a nearby GT the box stays put
        far = pred.copy(); far[0, :2] += 30.0
        db.save_modar(tok0, 0, far)
        out2, _ = ds._load_and_propagate_modar(tok0, 0, propagate=True, lidar_token=lt0)
        np.testing.assert_allclose(out2[0, :3], far[0, :3], atol=1e-6)

    def test_exchange_dropout_drops_some_agents(self):
        ds = self._ego_ds(EXCHANGE_ORACLE=True, EXCHANGE_DROPOUT=0.6)
        ds.training = True
        counts = []
        for _ in range(6):
            d = ds[1]
            counts.append(sum(v[1] for v in d["metadata"]["exchange"].values()))
        assert min(counts) < max(counts), f"dropout never varied the exchange: {counts}"

    def test_exchange_dropout_eval_is_deterministic_and_lossy(self):
        """At eval, EXCHANGE_DROPOUT simulates lossy broadcast: some agent
        messages must be dropped, and the draw is per-(sample, agent)
        deterministic so repeated evals of the same row are bit-identical."""
        ds = self._ego_ds(EXCHANGE_ORACLE=True, EXCHANGE_DROPOUT=0.5)
        ds.training = False
        per_sample = []
        for idx in range(min(len(ds), 6)):
            c1 = sum(v[1] for v in ds[idx]["metadata"]["exchange"].values())
            c2 = sum(v[1] for v in ds[idx]["metadata"]["exchange"].values())
            assert c1 == c2, f"eval dropout not deterministic at idx {idx}: {c1} vs {c2}"
            per_sample.append(c1)
        ds0 = self._ego_ds(EXCHANGE_ORACLE=True)
        ds0.training = False
        full = [sum(v[1] for v in ds0[idx]["metadata"]["exchange"].values())
                for idx in range(min(len(ds0), 6))]
        assert sum(per_sample) < sum(full), (
            f"p=0.5 eval dropout dropped nothing: {per_sample} vs full {full}")


class TestLateFusionWeighted:
    def test_weighted_method_fuses_cluster_geometry(self):
        from pcp_tpu.models.detectors.v2x_late_fusion import V2XLateFusion
        from pcp_tpu.config import CfgDict

        cfg = CfgDict({
            "BOX_FUSION_METHOD": "weighted_nms",
            "POST_PROCESSING": {
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 100,
                               "NMS_POST_MAXSIZE": 10},
            },
        })
        model = V2XLateFusion(cfg, 1, None)
        # same object from two agents, offset; plus one unique box
        a = np.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0, 0.9, 1.0]])
        b = np.array([[0.6, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0, 0.45, 1.0],
                      [15.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.5, 0.8, 1.0]])
        batch = {"batch_size": 1, "metadata": [{"exchange_boxes": {1: a, 2: b}}]}
        out = model(batch, train=False)
        fbd = out["final_box_dicts"]
        valid = fbd["pred_valid"][0]
        boxes = fbd["pred_boxes"][0][valid]
        assert valid.sum() == 2
        # fused duplicate: x = (0.9*0 + 0.45*0.6)/1.35 = 0.2
        i = np.argmin(np.abs(boxes[:, 0] - 0.2))
        np.testing.assert_allclose(boxes[i, 0], 0.2, atol=1e-5)
        # scores/labels follow the keeper
        np.testing.assert_allclose(np.sort(fbd["pred_scores"][0][valid]), [0.8, 0.9])
