"""KITTI official-eval port: golden cases that would catch AP errors >0.1,
plus calibration/box-conversion round trips."""
import numpy as np
import pytest

from pcp_tpu.datasets.kitti.kitti_eval import eval as kitti_eval
from pcp_tpu.utils import box_utils
from pcp_tpu.utils.calibration_kitti import Calibration


def make_anno(names, locs, dims=None, rots=None, bboxes=None, scores=None,
              trunc=None, occ=None):
    n = len(names)
    locs = np.asarray(locs, np.float64).reshape(n, 3)
    dims = np.asarray(dims if dims is not None else [[4.0, 1.6, 1.8]] * n,
                      np.float64).reshape(n, 3)  # lhw
    rots = np.asarray(rots if rots is not None else np.zeros(n), np.float64)
    bboxes = np.asarray(bboxes if bboxes is not None else
                        [[100, 100, 200, 200]] * n, np.float64).reshape(n, 4)
    anno = {
        "name": np.asarray(names, dtype=object),
        "truncated": np.asarray(trunc if trunc is not None else np.zeros(n)),
        "occluded": np.asarray(occ if occ is not None else np.zeros(n, np.int64)),
        "alpha": rots.copy(),
        "bbox": bboxes,
        "dimensions": dims,
        "location": locs,
        "rotation_y": rots,
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    return anno


class TestOverlaps:
    def test_image_box_overlap_iou(self):
        a = np.array([[0.0, 0, 10, 10]])
        b = np.array([[5.0, 0, 15, 10]])
        got = kitti_eval.image_box_overlap(a, b)
        np.testing.assert_allclose(got[0, 0], 50 / 150, rtol=1e-6)

    def test_bev_overlap_axis_aligned(self):
        # camera-frame (x, z, w, l, ry): two unit squares half-overlapping
        a = np.array([[0.0, 0, 1, 1, 0]])
        b = np.array([[0.5, 0, 1, 1, 0]])
        got = kitti_eval.bev_box_overlap(a, b)
        np.testing.assert_allclose(got[0, 0], 0.5 / 1.5, rtol=1e-4)

    def test_d3_overlap_identical(self):
        # camera box (x, y, z, l, h, w, ry), y down, h along -y
        box = np.array([[0.0, 1.0, 10.0, 4.0, 1.5, 1.8, 0.3]])
        got = kitti_eval.d3_box_overlap(box, box)
        np.testing.assert_allclose(got[0, 0], 1.0, rtol=1e-4)


class TestThresholds:
    def test_known_sequence(self):
        # 4 gt, 4 tp scores: recall steps 0.25 -> every score kept (41-pt grid)
        th = kitti_eval.get_thresholds(np.array([0.9, 0.8, 0.7, 0.6]), 4)
        np.testing.assert_allclose(th, [0.9, 0.8, 0.7, 0.6])


def _eval_result(gt_annos, dt_annos, classes=("Car",)):
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, list(classes))
    return ret


class TestAPProtocol:
    def _frame(self, n_gt, n_dt, score0=0.9):
        locs = [[i * 10.0, 1.0, 10.0 + i * 10] for i in range(max(n_gt, n_dt))]
        bb = [[100, 100, 200, 200]] * max(n_gt, n_dt)
        gt = make_anno(["Car"] * n_gt, locs[:n_gt], bboxes=bb[:n_gt])
        dt = make_anno(["Car"] * n_dt, locs[:n_dt], bboxes=bb[:n_dt],
                       scores=[score0 - 0.001 * i for i in range(n_dt)])
        return gt, dt

    def test_perfect_detections_ap_100(self):
        # enough GT (>41 distinct TP scores) that the 41-recall-point grid
        # fills completely — the protocol's intended regime
        gts, dts = [], []
        for f in range(12):
            gt, dt = self._frame(5, 5, score0=0.9 - 0.01 * f)
            gts.append(gt)
            dts.append(dt)
        ret = _eval_result(gts, dts)
        assert ret["Car_3d/easy_R40"] == pytest.approx(100.0, abs=0.5)
        assert ret["Car_bev/moderate_R40"] == pytest.approx(100.0, abs=0.5)
        assert ret["Car_image/hard_R40"] == pytest.approx(100.0, abs=0.5)

    def test_half_recall_caps_ap(self):
        gts, dts = [], []
        for f in range(12):
            gt, dt = self._frame(5, 5, score0=0.9 - 0.01 * f)
            # drop the last 2-3 detections: ~half the GT goes undetected
            keep = 2 if f % 2 else 3
            for k in ("name", "truncated", "occluded", "alpha", "bbox",
                      "dimensions", "location", "rotation_y", "score"):
                dt[k] = dt[k][:keep]
            gts.append(gt)
            dts.append(dt)
        ret = _eval_result(gts, dts)
        # precision 1 up to recall 0.5, then the PR curve ends: AP-R40 ~ 50
        assert 40.0 < ret["Car_3d/easy_R40"] < 60.0

    def test_false_positives_lower_ap(self):
        gts, dts = [], []
        for f in range(12):
            gt, dt = self._frame(2, 2, score0=0.9 - 0.01 * f)
            # add 2 far-away FPs at higher score than the TPs
            fp = make_anno(["Car", "Car"], [[500.0, 1, 500], [600.0, 1, 600]],
                           scores=[0.95, 0.93])
            for k in dt:
                dt[k] = np.concatenate([fp[k], dt[k]], axis=0)
            gts.append(gt)
            dts.append(dt)
        ret = _eval_result(gts, dts)
        assert ret["Car_3d/easy_R40"] < 60.0

    def test_van_gt_neither_tp_nor_fp_for_car(self):
        gts, dts = [], []
        for f in range(12):
            gt, dt = self._frame(5, 5, score0=0.9 - 0.01 * f)
            # an extra Van GT; a high-score Car detection right on it must
            # count neither as TP nor FP (neighbor-class ignore)
            van = make_anno(["Van"], [[50.0, 1.0, 60.0]])
            for k in ("name", "truncated", "occluded", "alpha", "bbox",
                      "dimensions", "location", "rotation_y"):
                gt[k] = np.concatenate([gt[k], van[k]], axis=0)
            det_on_van = make_anno(["Car"], [[50.0, 1.0, 60.0]], scores=[0.99])
            for k in dt:
                dt[k] = np.concatenate([dt[k], det_on_van[k]], axis=0)
            gts.append(gt)
            dts.append(dt)
        ret = _eval_result(gts, dts)
        assert ret["Car_3d/easy_R40"] == pytest.approx(100.0, abs=0.5)

    def test_small_gt_ignored_on_easy(self):
        # a GT with bbox height < 40px is ignored at easy difficulty: missing
        # it must not hurt easy AP, but it counts at hard
        gts, dts = [], []
        for f in range(12):
            gt, dt = self._frame(5, 5, score0=0.9 - 0.01 * f)
            small = make_anno(["Car"], [[80.0, 1.0, 90.0]], bboxes=[[0, 0, 30, 30]])
            for k in ("name", "truncated", "occluded", "alpha", "bbox",
                      "dimensions", "location", "rotation_y"):
                gt[k] = np.concatenate([gt[k], small[k]], axis=0)
            gts.append(gt)
            dts.append(dt)
        ret = _eval_result(gts, dts)
        assert ret["Car_3d/easy_R40"] == pytest.approx(100.0, abs=0.5)
        assert ret["Car_3d/hard_R40"] < 99.0  # the missed small GT counts at hard


class TestCalibAndBoxes:
    def _calib(self):
        return Calibration({
            "P2": np.array([[700.0, 0, 600, 45], [0, 700, 180, -0.3],
                            [0, 0, 1.0, 0.005]], np.float32),
            "P3": np.zeros((3, 4), np.float32),
            "R0": np.array([[1, 0.01, 0], [-0.01, 1, 0], [0, 0, 1]], np.float32),
            "Tr_velo2cam": np.array([[0.0, -1, 0, -0.06], [0, 0, -1, -0.08],
                                     [1, 0, 0, -0.27]], np.float32),
        })

    def test_rect_lidar_roundtrip(self):
        calib = self._calib()
        pts = np.random.default_rng(0).uniform(-20, 20, (50, 3)).astype(np.float32)
        back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_box_camera_lidar_roundtrip(self):
        calib = self._calib()
        lidar = np.array([[10.0, 3.0, -1.0, 4.2, 1.8, 1.6, 0.4],
                          [25.0, -6.0, -0.8, 3.9, 1.6, 1.5, -1.2]])
        cam = box_utils.boxes3d_lidar_to_kitti_camera(lidar, calib)
        back = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
        np.testing.assert_allclose(back[:, :6], lidar[:, :6], atol=1e-3)
        # heading round-trips modulo 2*pi
        d = np.abs(back[:, 6] - lidar[:, 6]) % (2 * np.pi)
        assert np.all(np.minimum(d, 2 * np.pi - d) < 1e-3)

    def test_image_boxes_shape_and_clip(self):
        calib = self._calib()
        lidar = np.array([[10.0, 0.0, -1.0, 4.2, 1.8, 1.6, 0.0]])
        cam = box_utils.boxes3d_lidar_to_kitti_camera(lidar, calib)
        img = box_utils.boxes3d_kitti_camera_to_imageboxes(
            cam, calib, image_shape=(375, 1242))
        assert img.shape == (1, 4)
        assert (img[:, [0, 2]] <= 1241).all() and (img[:, [1, 3]] <= 374).all()
        assert (img >= 0).all()
        assert img[0, 2] > img[0, 0] and img[0, 3] > img[0, 1]
