"""GT-database build -> sample round trip (VERDICT r3 missing #2).

Covers the producer ports:
  * ``KittiDataset.create_groundtruth_database`` (reference
    kitti_dataset.py:224-275) over a tiny on-disk KITTI tree built by
    ``create_kitti_infos``;
  * ``create_integrated_database`` (reference
    tools/process_tools/create_integrated_database.py) with offset
    verification;
  * ``DataBaseSampler`` consuming the freshly built DB — per-object .bin
    path AND integrated-.npy path — pasting objects into a scene.
"""
import pickle

import numpy as np
import pytest

from pcp_tpu.config import CfgDict


def _identity_calib_lines():
    # P2 = K [I|0] with fu=fv=700, cu=600, cv=180; R0 = I; velo->cam:
    # cam x=-y_l, y=-z_l, z=x_l (standard KITTI axis swap)
    p = "700. 0. 600. 0. 0. 700. 180. 0. 0. 0. 1. 0."
    tr = "0. -1. 0. 0. 0. 0. -1. 0. 1. 0. 0. 0."
    r0 = "1. 0. 0. 0. 1. 0. 0. 0. 1."
    return [
        f"P0: {p}\n", f"P1: {p}\n", f"P2: {p}\n", f"P3: {p}\n",
        f"R0_rect: {r0}\n", f"Tr_velo_to_cam: {tr}\n",
    ]


def _make_kitti_tree(root, sample_ids=("000000", "000001")):
    """Two samples, each: one Car at a known lidar location + clutter."""
    (root / "ImageSets").mkdir(parents=True)
    (root / "ImageSets" / "train.txt").write_text("\n".join(sample_ids) + "\n")
    training = root / "training"
    rng = np.random.default_rng(7)
    box_centers = {}
    for k, sid in enumerate(sample_ids):
        (training / "velodyne").mkdir(parents=True, exist_ok=True)
        (training / "calib").mkdir(exist_ok=True)
        (training / "label_2").mkdir(exist_ok=True)
        # car ahead of the camera (lidar frame: x forward)
        center = np.array([12.0 + 2.0 * k, 1.0 - k, -0.8])
        box_centers[sid] = center
        in_box = center + rng.uniform(-0.5, 0.5, size=(40, 3)) * np.array([1.8, 0.7, 0.6])
        clutter = rng.uniform(-20, 20, size=(200, 3))
        clutter[:, 0] = np.abs(clutter[:, 0]) + 2.0  # keep in front (FOV crop)
        clutter[:, 2] = -1.6
        pts = np.concatenate([in_box, clutter])
        pts4 = np.hstack([pts, np.full((pts.shape[0], 1), 0.3)]).astype(np.float32)
        pts4.tofile(str(training / "velodyne" / f"{sid}.bin"))
        with open(training / "calib" / f"{sid}.txt", "w") as f:
            f.writelines(_identity_calib_lines())
        # label (camera frame): loc = rect coords of box CENTER BOTTOM
        # lidar (x,y,z_center) -> rect (x=-y_l, y=-z_bottom, z=x_l)
        h, w, l = 1.5, 1.8, 4.0
        z_bottom = center[2] - h / 2
        loc = (-center[1], -z_bottom, center[0])
        with open(training / "label_2" / f"{sid}.txt", "w") as f:
            f.write(
                f"Car 0.0 0 0.0 500 150 700 300 {h} {w} {l} "
                f"{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} 0.0\n"
            )
    return box_centers


DATASET_CFG = CfgDict({
    "DATA_SPLIT": {"train": "train", "test": "val"},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "POINT_CLOUD_RANGE": [-70, -40, -3, 70, 40, 1],
    "DATA_PROCESSOR": [],
    "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": [], "AUG_CONFIG_LIST": []},
})


@pytest.fixture(scope="module")
def kitti_db(tmp_path_factory):
    from pcp_tpu.datasets.kitti.kitti_dataset import create_kitti_infos

    root = tmp_path_factory.mktemp("kitti")
    centers = _make_kitti_tree(root)
    create_kitti_infos(DATASET_CFG, ["Car"], root, root)
    return root, centers


class TestGtDatabaseBuild:
    def test_dbinfos_written(self, kitti_db):
        root, centers = kitti_db
        with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
            db_infos = pickle.load(f)
        assert set(db_infos) == {"Car"} and len(db_infos["Car"]) == 2
        for info in db_infos["Car"]:
            assert (root / info["path"]).exists()
            pts = np.fromfile(str(root / info["path"]), np.float32).reshape(-1, 4)
            assert pts.shape[0] == info["num_points_in_gt"] > 10
            # box-centered crop: points hug the origin
            assert np.abs(pts[:, :2]).max() < 3.0
            # and box3d_lidar matches the planted center
            np.testing.assert_allclose(
                info["box3d_lidar"][:3], centers[info["image_idx"]], atol=0.05)
            assert {"difficulty", "bbox", "score"} <= set(info)

    def test_integrated_database(self, kitti_db):
        from pcp_tpu.datasets.augmentor.gt_database import create_integrated_database

        root, _ = kitti_db
        db_infos, global_db = create_integrated_database(
            root / "kitti_dbinfos_train.pkl", root, "kitti_gt_database_global", 4)
        total = sum(i["num_points_in_gt"] for v in db_infos.values() for i in v)
        assert global_db.shape == (total, 4)
        assert (root / "kitti_gt_database_global.npy").exists()
        # offsets reproduce each object's rows exactly (reference verify())
        for info in db_infos["Car"]:
            s, e = info["global_data_offset"]
            disk = np.fromfile(str(root / info["path"]), np.float32).reshape(-1, 4)
            np.testing.assert_array_equal(global_db[s:e], disk)
        # reloaded pkl carries the offsets too
        with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
            again = pickle.load(f)
        assert all("global_data_offset" in i for i in again["Car"])


class TestSamplerRoundTrip:
    def _sample(self, root, extra_cfg=None):
        from pcp_tpu.datasets.augmentor.database_sampler import DataBaseSampler

        cfg = CfgDict({
            "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
            "SAMPLE_GROUPS": ["Car:5"],
            "NUM_POINT_FEATURES": 4,
            "PREPARE": {"filter_by_min_points": ["Car:5"]},
        })
        if extra_cfg:
            cfg.update(extra_cfg)
        sampler = DataBaseSampler(root, cfg, ["Car"])
        scene = {
            "points": np.random.default_rng(0).uniform(-5, 5, (100, 4)).astype(np.float32),
            "gt_boxes": np.zeros((0, 7), np.float64),
            "gt_names": np.zeros((0,), dtype="<U16"),
        }
        return sampler, sampler(scene)

    def test_bin_path(self, kitti_db):
        root, _ = kitti_db
        sampler, out = self._sample(root)
        assert sampler.gt_database_data is None
        assert out["gt_boxes"].shape[0] > 0
        assert out["points"].shape[0] > 100  # pasted object points added
        # pasted points sit near their pasted boxes
        for b in out["gt_boxes"]:
            d = np.linalg.norm(out["points"][:, :2] - b[None, :2], axis=1)
            assert (d < 4.0).sum() > 10

    def test_integrated_path(self, kitti_db):
        root, _ = kitti_db
        sampler, out = self._sample(
            root, {"DB_DATA_PATH": ["kitti_gt_database_global.npy"]})
        assert sampler.gt_database_data is not None
        assert out["gt_boxes"].shape[0] > 0 and out["points"].shape[0] > 100
