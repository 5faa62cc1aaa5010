"""Raw-DB info building against a schema-faithful mocked devkit.

Covers the two build paths the reference gates behind nuscenes-devkit:
  * V2X-Sim: `_build_train_val_split` + `build_v2x_sim_info` (RSU) +
    the per-lidar CAR variant (reference v2x_sim_dataset_rsu.py:77-164,
    v2x_sim_dataset_car.py:66-135), then an end-to-end __getitem__ from the
    freshly built pkls;
  * plain nuScenes: `create_nuscenes_infos` (reference
    nuscenes_utils.py:253-381) with sweeps / velocities / name mapping, then
    a NuScenesDataset __getitem__ from the built pkls.

The FakeNuScenes below implements the exact table schema the devkit exposes
(sample / sample_data / ego_pose / calibrated_sensor / sample_annotation /
scene / log) over plain dicts + tiny .bin files on disk.
"""
import numpy as np
import pytest

from pcp_tpu.config import cfg_from_yaml_file, ROOT_DIR, CfgDict as EasyDict


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


class FakeNuScenes:
    def __init__(self, dataroot, tables):
        self.dataroot = str(dataroot)
        self._tables = tables
        self.sample = list(tables["sample"].values())
        self.scene = list(tables["scene"].values())

    def get(self, table, token):
        return self._tables[table][token]

    def get_sample_data_path(self, sample_data_token):
        from pathlib import Path

        return str(Path(self.dataroot) / self._tables["sample_data"][sample_data_token]["filename"])


def _write_bin(path, points_xyz):
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.zeros((points_xyz.shape[0], 5), np.float32)
    pts[:, :3] = points_xyz
    pts[:, 3] = 0.5
    pts.astype(np.float32).tofile(str(path))


def _box_points(center, n=24, spread=0.6, rng=None):
    rng = rng or np.random.default_rng(0)
    return center[None, :] + rng.uniform(-spread, spread, size=(n, 3))


# --------------------------------------------------------------------- V2X-Sim
def _make_v2x_db(root):
    """2 scenes (towns 4 -> train, 3 -> val), 3 keyframes, lidars id_0..id_2
    (+ a SEM channel that must be filtered), 2 moving cars."""
    version = "v2.0-trainval"
    dataroot = root / version
    tables = {k: {} for k in ("scene", "log", "sample", "sample_data",
                              "ego_pose", "calibrated_sensor", "sample_annotation")}
    rng = np.random.default_rng(3)

    tables["calibrated_sensor"]["cs0"] = {
        "token": "cs0", "translation": [0.0, 0.0, 1.8], "rotation": _yaw_quat(0.0)}

    for si, town in enumerate((4, 3)):
        scene_tok, log_tok = f"sc{si}", f"log{si}"
        tables["log"][log_tok] = {"token": log_tok, "location": town}
        first = None
        for kf in range(3):
            t_us = int((si * 100 + kf) * 0.2e6)
            samp_tok = f"{scene_tok}_s{kf}"
            data = {}
            # agents: RSU id0 static; cars id1/id2 moving along +x
            agent_pose = {
                0: (np.array([0.0, 0.0, 3.0]), 0.0),
                1: (np.array([-10.0 + 4.0 * kf, 2.0, 0.0]), 0.0),
                2: (np.array([8.0, -6.0 + 3.0 * kf, 0.0]), np.pi / 2),
            }
            # two GT cars driving
            car_centers = [np.array([5.0 + 1.0 * kf, 3.0, -1.0]),
                           np.array([-4.0, -2.0 + 0.5 * kf, -1.0])]
            for lid in range(3):
                sd_tok = f"{samp_tok}_id{lid}"
                pose_tok = f"pose_{sd_tok}"
                pos, yaw = agent_pose[lid]
                tables["ego_pose"][pose_tok] = {
                    "token": pose_tok, "translation": pos.tolist(),
                    "rotation": _yaw_quat(yaw)}
                fname = f"sweeps/LIDAR_TOP_id_{lid}/{sd_tok}.bin"
                tables["sample_data"][sd_tok] = {
                    "token": sd_tok, "sample_token": samp_tok,
                    "channel": f"LIDAR_TOP_id_{lid}", "timestamp": t_us,
                    "ego_pose_token": pose_tok, "calibrated_sensor_token": "cs0",
                    "prev": f"{scene_tok}_s{kf-1}_id{lid}" if kf > 0 else "",
                    "next": f"{scene_tok}_s{kf+1}_id{lid}" if kf < 2 else "",
                    "filename": fname, "is_key_frame": True,
                }
                data[f"LIDAR_TOP_id_{lid}"] = sd_tok
                # points: both cars + ground, in the agent's lidar frame
                sensor_pos = pos + np.array([0.0, 0.0, 1.8])
                c, s = np.cos(-yaw), np.sin(-yaw)
                world = np.concatenate(
                    [_box_points(cc, rng=rng) for cc in car_centers]
                    + [np.array([[2.0, 2.0, -2.0], [-3.0, 1.0, -2.0]])], axis=0)
                rel = world - sensor_pos[None, :]
                local = np.stack([c * rel[:, 0] - s * rel[:, 1],
                                  s * rel[:, 0] + c * rel[:, 1], rel[:, 2]], axis=1)
                _write_bin(dataroot / fname, local)
            # SEM channel that include_v2x_sim_data must drop
            sem_tok = f"{samp_tok}_sem"
            tables["sample_data"][sem_tok] = {
                "token": sem_tok, "sample_token": samp_tok,
                "channel": "LIDAR_TOP_id_1_SEM", "timestamp": t_us,
                "ego_pose_token": f"pose_{samp_tok}_id1",
                "calibrated_sensor_token": "cs0",
                "prev": "", "next": "", "filename": "x.bin", "is_key_frame": True,
            }
            data["LIDAR_TOP_id_1_SEM"] = sem_tok

            anns = []
            for ci, cc in enumerate(car_centers):
                anno_tok = f"{samp_tok}_a{ci}"
                anns.append(anno_tok)
                tables["sample_annotation"][anno_tok] = {
                    "token": anno_tok, "sample_token": samp_tok,
                    "instance_token": f"inst{ci}",
                    "category_name": "vehicle.car",
                    "translation": cc.tolist(), "size": [1.9, 4.5, 1.6],  # w, l, h
                    "rotation": _yaw_quat(0.1 * ci),
                    "prev": f"{scene_tok}_s{kf-1}_a{ci}" if kf > 0 else "",
                    "next": f"{scene_tok}_s{kf+1}_a{ci}" if kf < 2 else "",
                    "num_lidar_pts": 24, "num_radar_pts": 0,
                }
            tables["sample"][samp_tok] = {
                "token": samp_tok, "scene_token": scene_tok, "timestamp": t_us,
                "data": data, "anns": anns,
                "prev": f"{scene_tok}_s{kf-1}" if kf > 0 else "",
                "next": f"{scene_tok}_s{kf+1}" if kf < 2 else "",
            }
            if first is None:
                first = samp_tok
        tables["scene"][scene_tok] = {
            "token": scene_tok, "log_token": log_tok,
            "first_sample_token": first, "name": scene_tok,
        }
    return FakeNuScenes(dataroot, tables), version


class TestV2XSimInfoBuild:
    def test_build_and_consume(self, tmp_path):
        from pcp_tpu.datasets.v2x_sim.source import NuScenesV2XSource
        from pcp_tpu.datasets.v2x_sim.v2x_sim_dataset_rsu import V2XSimDataset_RSU
        from pcp_tpu.datasets.v2x_sim.v2x_sim_dataset_car import V2XSimDataset_CAR

        fake, version = _make_v2x_db(tmp_path)
        src = NuScenesV2XSource(tmp_path / version, version, nusc=fake)

        cfg = cfg_from_yaml_file(
            str(ROOT_DIR / "tools/cfgs/dataset_configs/v2x_sim_dataset_rsu.yaml"),
            EasyDict())
        cfg.DATA_CONFIG = None  # unused
        dcfg = cfg
        dcfg.DATA_PATH = str(tmp_path)
        dcfg.VERSION = version
        dcfg.USE_SYNTHETIC_DATA = False
        dcfg.MINI_TRAINVAL_STRIDE = 1
        dcfg.THRESHOLD_BOXES_BY_POINTS = 5

        rsu = V2XSimDataset_RSU(dcfg, ["car"], training=True, source=src)
        assert len(rsu.infos) == 0  # nothing built yet
        train_infos, val_infos = rsu.build_v2x_sim_info()
        # town 4 scene -> train, town 3 -> val; 3 keyframes each
        assert len(train_infos) == 3 and len(val_infos) == 3
        info = train_infos[0]
        for key in ("token", "lidar_token", "glob_se3_lidar", "gt_boxes",
                    "gt_names", "num_points_in_boxes", "lidar_path", "timestamp"):
            assert key in info
        assert info["gt_boxes"].shape[1] == 7
        # both synthetic cars have >= threshold points in every agent's frame
        assert info["gt_boxes"].shape[0] == 2
        # boxes are in the RSU lidar frame: RSU sensor at (0,0,4.8)
        assert np.all(info["gt_boxes"][:, 2] < 0)

        # consume: fresh dataset now picks up the pkls end-to-end
        rsu2 = V2XSimDataset_RSU(dcfg, ["car"], training=True, source=src)
        assert len(rsu2.infos) == 3
        item = rsu2[0]
        assert item["points"].shape[0] > 0
        assert item["gt_boxes"].shape[0] >= 1

        # CAR variant: per-lidar dict pkls, SEM channels never enter
        car_cfg = _car_cfg(dcfg)
        train_car, val_car = V2XSimDataset_CAR.build_v2x_sim_info(
            V2XSimDataset_CAR(car_cfg, ["car"], training=True, source=src))
        assert set(train_car.keys()) == {1, 2, 3, 4, 5}
        assert len(train_car[1]) == 3 and len(train_car[2]) == 3
        assert len(train_car[3]) == 0  # no id_3 in the mock
        car_ds = V2XSimDataset_CAR(car_cfg, ["car"], training=True, source=src)
        assert len(car_ds.infos) == 6  # 2 lidars x 3 keyframes, SEM dropped
        assert all("SEM" not in fake.get("sample_data", i["lidar_token"])["channel"]
                   for i in car_ds.infos)
        item = car_ds[0]
        assert item["points"].shape[0] > 0


def _car_cfg(dcfg):
    d = EasyDict(dict(dcfg))
    d.THRESHOLD_BOXES_BY_POINTS = 1
    d.INFO_PATH = {"train": ["v2x_sim_car_infos_10sweeps_train.pkl"],
                   "test": ["v2x_sim_car_infos_10sweeps_val.pkl"]}
    return d


# --------------------------------------------------------------- plain nuScenes
def _make_nusc_db(root):
    """1 train + 1 val scene, 2 keyframes each with one intermediate sweep,
    one moving car (velocity from prev/next annos) + one pedestrian."""
    version = "v1.0-mini"
    dataroot = root / version
    tables = {k: {} for k in ("scene", "log", "sample", "sample_data",
                              "ego_pose", "calibrated_sensor", "sample_annotation")}
    rng = np.random.default_rng(5)
    tables["calibrated_sensor"]["cs_l"] = {
        "token": "cs_l", "translation": [0.0, 0.0, 1.7], "rotation": _yaw_quat(0.0)}
    tables["calibrated_sensor"]["cs_c"] = {
        "token": "cs_c", "translation": [1.5, 0.0, 1.5], "rotation": _yaw_quat(0.0),
        "camera_intrinsic": np.eye(3).tolist()}

    for si, split in enumerate(("train", "val")):
        scene_tok, log_tok = f"ns{si}", f"nslog{si}"
        tables["log"][log_tok] = {"token": log_tok, "location": f"loc{si}"}
        first = None
        sd_chain = []  # all lidar sample_data in time order (incl. sweeps)
        for kf in range(2):
            t_us = int((si * 100 + kf) * 0.5e6)
            samp_tok = f"{scene_tok}_s{kf}"
            ego_xy = np.array([2.0 * kf, 0.0])
            car_center = np.array([6.0 + 2.0 * kf, 1.0, 0.2])

            for sub in range(2):  # sub 0 = keyframe, sub 1 = intermediate sweep
                if kf == 1 and sub == 1:
                    continue
                sd_tok = f"{samp_tok}_l{sub}"
                pose_tok = f"pose_{sd_tok}"
                tables["ego_pose"][pose_tok] = {
                    "token": pose_tok,
                    "translation": [ego_xy[0] + sub, ego_xy[1], 0.0],
                    "rotation": _yaw_quat(0.0)}
                fname = f"sweeps/LIDAR_TOP/{sd_tok}.bin"
                tables["sample_data"][sd_tok] = {
                    "token": sd_tok, "sample_token": samp_tok,
                    "channel": "LIDAR_TOP",
                    "timestamp": t_us + sub * int(0.25e6),
                    "ego_pose_token": pose_tok, "calibrated_sensor_token": "cs_l",
                    "prev": "", "next": "", "filename": fname,
                    "is_key_frame": sub == 0,
                }
                sd_chain.append(sd_tok)
                sensor_pos = np.array([ego_xy[0] + sub, ego_xy[1], 1.7])
                world = np.concatenate(
                    [_box_points(car_center, rng=rng),
                     np.array([[1.0, -2.0, -0.2], [3.0, 2.0, -0.2]])], axis=0)
                _write_bin(dataroot / fname, world - sensor_pos[None, :])

            cam_tok = f"{samp_tok}_cam"
            tables["sample_data"][cam_tok] = {
                "token": cam_tok, "sample_token": samp_tok, "channel": "CAM_FRONT",
                "timestamp": t_us, "ego_pose_token": f"pose_{samp_tok}_l0",
                "calibrated_sensor_token": "cs_c", "prev": "", "next": "",
                "filename": f"samples/CAM_FRONT/{cam_tok}.jpg", "is_key_frame": True,
            }
            (dataroot / "samples/CAM_FRONT").mkdir(parents=True, exist_ok=True)
            (dataroot / f"samples/CAM_FRONT/{cam_tok}.jpg").write_bytes(b"")

            anno_tok = f"{samp_tok}_a0"
            tables["sample_annotation"][anno_tok] = {
                "token": anno_tok, "sample_token": samp_tok,
                "instance_token": "car0", "category_name": "vehicle.car",
                "translation": car_center.tolist(), "size": [1.9, 4.5, 1.6],
                "rotation": _yaw_quat(0.0),
                "prev": f"{scene_tok}_s{kf-1}_a0" if kf > 0 else "",
                "next": f"{scene_tok}_s{kf+1}_a0" if kf < 1 else "",
                "num_lidar_pts": 24, "num_radar_pts": 0,
            }
            anno_ped = f"{samp_tok}_a1"
            tables["sample_annotation"][anno_ped] = {
                "token": anno_ped, "sample_token": samp_tok,
                "instance_token": "ped0",
                "category_name": "human.pedestrian.adult",
                "translation": [0.0, 5.0, 0.0], "size": [0.6, 0.6, 1.8],
                "rotation": _yaw_quat(0.0), "prev": "", "next": "",
                "num_lidar_pts": 0, "num_radar_pts": 0,  # filtered by the mask
            }
            tables["sample"][samp_tok] = {
                "token": samp_tok, "scene_token": scene_tok, "timestamp": t_us,
                "data": {"LIDAR_TOP": f"{samp_tok}_l0", "CAM_FRONT": cam_tok},
                "anns": [anno_tok, anno_ped],
                "prev": f"{scene_tok}_s{kf-1}" if kf > 0 else "",
                "next": f"{scene_tok}_s{kf+1}" if kf < 1 else "",
            }
            if first is None:
                first = samp_tok
        # stitch the lidar prev-chain in time order
        for a, b in zip(sd_chain[:-1], sd_chain[1:]):
            tables["sample_data"][b]["prev"] = a
            tables["sample_data"][a]["next"] = b
        tables["scene"][scene_tok] = {
            "token": scene_tok, "log_token": log_tok, "first_sample_token": first,
            "name": scene_tok, "split": split,
        }
    return FakeNuScenes(dataroot, tables), version


class TestNuScenesInfoBuild:
    def test_build_and_consume(self, tmp_path):
        from pcp_tpu.datasets.nuscenes.info_builder import create_nuscenes_infos

        fake, version = _make_nusc_db(tmp_path)
        save = tmp_path / version
        train_infos, val_infos = create_nuscenes_infos(
            version, tmp_path / version, save, max_sweeps=3, nusc=fake)
        assert len(train_infos) == 2 and len(val_infos) == 2

        info = train_infos[1]  # second keyframe: has a real past sweep
        assert len(info["sweeps"]) == 2
        # first past sweep has a real transform; time lag is positive
        assert info["sweeps"][0]["transform_matrix"] is not None
        assert info["sweeps"][0]["time_lag"] > 0
        # the zero-lidar-point pedestrian is masked out; car name is mapped
        assert list(info["gt_names"]) == ["car"]
        assert info["gt_boxes"].shape == (1, 9)
        # finite-difference velocity ~ (2 m / 0.5 s, 0)
        np.testing.assert_allclose(info["gt_boxes"][0, 7:9], [4.0, 0.0], atol=1e-6)
        # box center is in the lidar frame (sensor at x=2 + 1.7 up at kf1)
        np.testing.assert_allclose(info["gt_boxes"][0, :3], [6.0, 1.0, -1.5], atol=1e-6)

        # consume with NuScenesDataset runtime
        from pcp_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset

        dcfg = EasyDict(cfg_from_yaml_file(
            str(ROOT_DIR / "tools/cfgs/dataset_configs/nuscenes_dataset.yaml"),
            EasyDict()))
        dcfg.DATA_PATH = str(tmp_path)
        dcfg.VERSION = version
        dcfg.INFO_PATH = {"train": ["nuscenes_infos_3sweeps_train.pkl"],
                          "test": ["nuscenes_infos_3sweeps_val.pkl"]}
        dcfg.MAX_SWEEPS = 3
        dcfg.BALANCED_RESAMPLING = False
        ds = NuScenesDataset(dcfg, ["car"], training=False)
        assert len(ds.infos) == 2
        item = ds[1]
        assert item["points"].shape[0] > 0
