"""Golden-case tests of the native nuScenes-protocol metric.

Pattern from the reference's oracle test (GT fed as predictions -> perfect
scores, /root/reference/test_space/test_v2x_dataset_eval.py:8-33) plus
hand-computed AP/TP cases that would catch an AP off by > 0.1.
"""
import numpy as np
import pytest

from pcp_tpu.datasets.eval.detection_metrics import (
    _calc_ap,
    _accumulate,
    nuscenes_protocol_eval,
)


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.6), z=0.0):
    return np.array([x, y, z, *dims, yaw], dtype=np.float64)


def _gt(boxes, names, **extra):
    d = {"boxes": np.asarray(boxes, dtype=np.float64), "names": np.asarray(names)}
    d.update(extra)
    return d


def _anno(token, boxes, scores, names, **extra):
    d = {
        "metadata": {"lidar_token": token},
        "boxes_lidar": np.asarray(boxes, dtype=np.float64),
        "score": np.asarray(scores, dtype=np.float64),
        "name": np.asarray(names),
    }
    d.update(extra)
    return d


class TestOracle:
    def test_gt_as_predictions_perfect(self):
        rng = np.random.default_rng(0)
        gt_by_token = {}
        det_annos = []
        for t in range(4):
            n = 5
            boxes = np.stack([
                _box(x, y, yaw)
                for x, y, yaw in zip(
                    rng.uniform(-40, 40, n), rng.uniform(-30, 30, n), rng.uniform(-3, 3, n)
                )
            ])
            gt_by_token[f"tok{t}"] = _gt(boxes, ["car"] * n)
            det_annos.append(_anno(f"tok{t}", boxes, rng.uniform(0.5, 1.0, n), ["car"] * n))
        _, res = nuscenes_protocol_eval(det_annos, gt_by_token, ["car"])
        assert res["car_AP"] > 0.98
        assert res["car_ATE"] < 1e-6
        assert res["car_ASE"] < 1e-6
        assert res["car_AOE"] < 1e-6
        assert res["NDS"] > 0.98


class TestCalcAP:
    def test_half_recall_hand_computed(self):
        """2 GT, 1 perfect pred -> recall 0.5, precision 1 everywhere below.

        Official AP: precision curve = 1 for recall bins <= 0.5, 0 above.
        Bins 11..101 of the 101-pt grid; (1 - 0.1) normalization.
        AP = (sum over rec in {0.11..0.50} of 0.9) / 90 / 0.9 = 40/90.
        """
        gt = {"t": _gt([_box(0, 0), _box(10, 0)], ["car", "car"])}
        det = [_anno("t", [_box(0, 0)], [0.9], ["car"])]
        _, res = nuscenes_protocol_eval(det, gt, ["car"])
        assert res["car_AP_dist_0.5"] == pytest.approx(40.0 / 90.0, abs=1e-6)

    def test_fp_before_tp_lowers_ap(self):
        gt = {"t": _gt([_box(0, 0)], ["car"])}
        det = [
            _anno("t", [_box(30, 30), _box(0, 0)], [0.9, 0.8], ["car", "car"])
        ]
        _, res = nuscenes_protocol_eval(det, gt, ["car"])
        # recall/precision points: (0, 0) then (1.0, 0.5); the official
        # 101-pt interpolation is linear between them, so precision(r) = r/2
        # and AP = mean over r in {0.11..1.00} of max(0, r/2 - 0.1) / 0.9
        rs = np.linspace(0.11, 1.0, 90)
        want = float(np.mean(np.clip(rs / 2 - 0.1, 0, None)) / 0.9)
        assert res["car_AP_dist_0.5"] == pytest.approx(want, abs=1e-6)

    def test_no_predictions_zero_ap(self):
        gt = {"t": _gt([_box(0, 0)], ["car"])}
        _, res = nuscenes_protocol_eval([], gt, ["car"])
        assert res["car_AP"] == 0.0


class TestRangeFiltering:
    def test_distant_gt_and_preds_excluded(self):
        # car class_range = 50 m: a GT at 60 m must not count as npos, and a
        # prediction at 60 m must not count as FP
        gt = {"t": _gt([_box(0, 0), _box(60, 0)], ["car", "car"])}
        det = [_anno("t", [_box(0, 0), _box(60, 0)], [0.9, 0.8], ["car", "car"])]
        _, res = nuscenes_protocol_eval(det, gt, ["car"])
        assert res["car_AP_dist_0.5"] > 0.98  # 1 GT, 1 TP, no FP

    def test_pedestrian_range_40(self):
        gt = {"t": _gt([_box(45, 0, dims=(0.6, 0.6, 1.7))], ["pedestrian"])}
        det = [_anno("t", [_box(45, 0, dims=(0.6, 0.6, 1.7))], [0.9], ["pedestrian"])]
        _, res = nuscenes_protocol_eval(det, gt, ["pedestrian"])
        assert np.isnan(res["pedestrian_AP"])  # no in-range GT -> undefined


class TestTPErrors:
    def test_recall_binned_cummean(self):
        """Official calc_tp averages the cummean error curve over recall bins
        (min_recall, max_recall], NOT the raw match mean (ADVICE r1 #5)."""
        # 10 GT (all within the 50 m car range); 5 TPs with descending scores
        # and known errors [0.1..0.5].
        offsets = [0.1, 0.2, 0.3, 0.4, 0.5]
        gts = [_box(5 * i, 0) for i in range(10)]  # x = 0..45 m
        gt = {"t": _gt(gts, ["car"] * 10)}
        det_boxes = [_box(5 * i + offsets[i], 0) for i in range(5)]
        det = [_anno("t", det_boxes, [0.9, 0.8, 0.7, 0.6, 0.5], ["car"] * 5)]
        _, res = nuscenes_protocol_eval(det, gt, ["car"])
        # recall of TP k = (k+1)/10; conf curve nonzero through recall 0.5
        # (bin 50). curve = cummean errors interped on conf grid; bins 11..50.
        cm = np.cumsum(offsets) / np.arange(1, 6)
        rec_interp = np.linspace(0, 1, 101)
        conf = np.interp(rec_interp, np.arange(1, 6) / 10.0, [0.9, 0.8, 0.7, 0.6, 0.5], right=0)
        curve = np.interp(conf[::-1], [0.5, 0.6, 0.7, 0.8, 0.9], cm[::-1])[::-1]
        want = float(np.mean(curve[11:51]))
        assert res["car_ATE"] == pytest.approx(want, abs=1e-6)

    def test_ave_present_only_with_velocities(self):
        boxes = [_box(0, 0)]
        gt_novel = {"t": _gt(boxes, ["car"])}
        det_novel = [_anno("t", boxes, [0.9], ["car"])]
        _, res = nuscenes_protocol_eval(det_novel, gt_novel, ["car"])
        assert "car_AVE" not in res

        gt_vel = {"t": _gt(boxes, ["car"], velocities=np.array([[1.0, 0.0]]))}
        det_vel = [_anno("t", boxes, [0.9], ["car"], velocity=np.array([[1.5, 0.0]]))]
        _, res2 = nuscenes_protocol_eval(det_vel, gt_vel, ["car"])
        assert res2["car_AVE"] == pytest.approx(0.5, abs=1e-6)
