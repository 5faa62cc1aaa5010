"""Plain nuScenes dataset — the pretraining lineage of the Aligner/HunterJr
("pointpillar_jr") models.

Capability match for /root/reference/pcdet/datasets/nuscenes/nuscenes_dataset.py:
info-pkl driven (runtime needs only the pkl + .bin files, no devkit),
multi-sweep point aggregation with per-sweep time lags, class-balanced
resampling, and nuScenes-protocol evaluation via the native metric
implementation. Info building from the raw DB requires nuscenes-devkit and is
gated behind ``build_nuscenes_info``.
"""
import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        root_path = (
            Path(root_path) if root_path is not None else Path(dataset_cfg["DATA_PATH"])
        ) / dataset_cfg["VERSION"]
        super().__init__(dataset_cfg, class_names, training, root_path, logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        for info_path in self.dataset_cfg["INFO_PATH"][mode]:
            p = self.root_path / info_path
            if not p.exists():
                if self.logger is not None:
                    self.logger.warning(f"nuScenes info missing: {p}")
                continue
            with open(p, "rb") as f:
                self.infos.extend(pickle.load(f))
        if self.logger is not None:
            self.logger.info(f"Total samples for NuScenes dataset: {len(self.infos)}")

    def balanced_infos_resampling(self, infos):
        """Class-balanced resampling (reference nuscenes_dataset.py)."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info.get("gt_names", [])):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        sampled = []
        ratios = [frac / max(len(v) / duplicated, 1e-9) for v in cls_infos.values()]
        for cur_infos, ratio in zip(cls_infos.values(), ratios):
            sampled += np.random.choice(cur_infos, int(len(cur_infos) * ratio)).tolist()
        return sampled or infos

    def get_sweep_points(self, info):
        """Aggregate the keyframe cloud + past sweeps with time lags
        (reference nuscenes_temporal_utils.get_sweeps)."""
        lidar_path = self.root_path / info["lidar_path"]
        points = np.fromfile(str(lidar_path), dtype=np.float32).reshape(-1, 5)[:, :4]
        points = np.hstack([points, np.zeros((points.shape[0], 1), np.float32)])
        max_sweeps = int(self.dataset_cfg.get("MAX_SWEEPS", 1))
        all_points = [points]
        for sweep in info.get("sweeps", [])[: max_sweeps - 1]:
            sp = np.fromfile(str(self.root_path / sweep["lidar_path"]), dtype=np.float32)
            sp = sp.reshape(-1, 5)[:, :4]
            tf = sweep["sensor2lidar"] if "sensor2lidar" in sweep else np.eye(4)
            xyz = sp[:, :3] @ np.asarray(tf)[:3, :3].T + np.asarray(tf)[:3, 3]
            lag = np.full((sp.shape[0], 1), sweep.get("time_lag", 0.0), np.float32)
            all_points.append(np.hstack([xyz, sp[:, 3:4], lag]).astype(np.float32))
        return np.concatenate(all_points)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def get_hd_map(self, info):
        """(5, H, W) raster: from a pre-generated ``map_path`` .npz (written
        by workspace/nuscenes_map_generating.py) or built live via MapMaker
        when the devkit is importable (reference consumes pre-rasterized maps
        the same way)."""
        if "map_path" in info:
            p = self.root_path / info["map_path"]
            with np.load(p) as z:
                return z[z.files[0]].astype(np.float32)
        if not hasattr(self, "_map_maker"):
            from .map_utils import MapMaker
            from nuscenes import NuScenes  # devkit-gated

            nusc = NuScenes(
                version=self.dataset_cfg["VERSION"], dataroot=str(self.root_path), verbose=False
            )
            self._map_maker = MapMaker(
                nusc, resolution=float(self.dataset_cfg.get("MAP_RESOLUTION", 0.2)),
                point_cloud_range=tuple(self.point_cloud_range),
            )
        return self._map_maker.make_representation(info["lidar_token"]).astype(np.float32)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_sweep_points(info)

        if bool(self.dataset_cfg.get("USE_HD_MAP", False)):
            from .map_utils import interpolate_map_at_points

            img_map = self.get_hd_map(info)
            map_feats = interpolate_map_at_points(
                img_map, points,
                self.point_cloud_range,
                float(self.dataset_cfg.get("MAP_RESOLUTION", 0.2)),
            )
            # feature order of pointpillar_jr_withmap.yaml: [x y z intensity
            # timestamp | 4 map layers + lane_dir | sweep_idx instance_idx]
            points = np.hstack([points[:, :5], map_feats, points[:, 5:]]).astype(np.float32)

        input_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info.get("token"), "lidar_token": info.get("lidar_token", info.get("token"))},
        }
        if "gt_boxes" in info:
            input_dict["gt_boxes"] = np.asarray(info["gt_boxes"])[:, :7]
            input_dict["gt_names"] = np.asarray(info["gt_names"])
        return self.prepare_data(data_dict=input_dict)

    def generate_prediction_dicts(self, batch_dict, final_box_dicts, class_names, output_path=None):
        from ..v2x_sim.v2x_sim_dataset_rsu import V2XSimDataset_RSU

        return V2XSimDataset_RSU.generate_prediction_dicts(
            self, batch_dict, final_box_dicts, class_names, output_path
        )

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..eval.detection_metrics import nuscenes_protocol_eval

        gt_by_token = {}
        for info in self.infos:
            gt_by_token[info.get("lidar_token", info.get("token"))] = {
                "boxes": np.asarray(info.get("gt_boxes", np.zeros((0, 7))))[:, :7],
                "names": np.asarray(info.get("gt_names", [])),
                "velocities": None,
            }
        return nuscenes_protocol_eval(
            det_annos, gt_by_token, class_names, output_path=kwargs.get("output_path")
        )


def build_nuscenes_info(dataset_cfg, class_names, data_path, save_path, max_sweeps=10,
                        nusc=None, logger=None):
    """Build info pkls from the raw nuScenes DB (reference create_nuscenes_info).
    ``nusc`` may be a devkit NuScenes or a schema-faithful mock (tested against
    one in tests/test_info_builders.py)."""
    from .info_builder import create_nuscenes_infos

    return create_nuscenes_infos(
        dataset_cfg["VERSION"], data_path, save_path, max_sweeps=max_sweeps,
        nusc=nusc, logger=logger)
