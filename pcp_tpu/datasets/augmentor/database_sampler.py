"""GT-paste augmentation (database sampler).

Counterpart of /root/reference/pcdet/datasets/augmentor/database_sampler.py.
Samples pre-extracted ground-truth object point clouds from a database pkl and
pastes them into the scene until per-class quotas are met, removing scene
points inside the pasted boxes. (Not used by any V2X-Sim config — they rely on
world-level augmentation only — but part of the framework surface for
KITTI/nuScenes-style training.)
"""
import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils


class DataBaseSampler:
    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.sampler_cfg = sampler_cfg
        self.class_names = class_names
        self.logger = logger
        self.db_infos = {}
        for class_name in class_names:
            self.db_infos[class_name] = []

        for db_info_path in sampler_cfg.get("DB_INFO_PATH", []):
            path = self.root_path / db_info_path
            if not path.exists():
                if logger is not None:
                    logger.warning(f"gt database missing: {path}")
                continue
            with open(path, "rb") as f:
                infos = pickle.load(f)
                for cur_class in class_names:
                    if cur_class in infos:
                        self.db_infos[cur_class].extend(infos[cur_class])

        # integrated database (reference database_sampler.py:398-402): one
        # resident .npy sliced by each info's global_data_offset, produced by
        # gt_database.create_integrated_database
        self.gt_database_data = None
        db_data_path = sampler_cfg.get("DB_DATA_PATH", [])
        if db_data_path:
            path = self.root_path / db_data_path[0]
            if path.exists():
                self.gt_database_data = np.load(str(path), mmap_mode="r")
            elif logger is not None:
                logger.warning(f"integrated gt database missing: {path}")

        for func_name, val in sampler_cfg.get("PREPARE", {}).items():
            self.db_infos = getattr(self, func_name)(self.db_infos, val)

        self.sample_groups = {}
        for x in sampler_cfg.get("SAMPLE_GROUPS", []):
            class_name, sample_num = x.split(":")
            if class_name in class_names:
                self.sample_groups[class_name] = {
                    "sample_num": int(sample_num),
                    "pointer": len(self.db_infos[class_name]),
                    "indices": np.arange(len(self.db_infos[class_name])),
                }

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for name_num in min_gt_points_list:
            name, min_num = name_num.split(":")
            min_num = int(min_num)
            if min_num > 0 and name in db_infos:
                db_infos[name] = [x for x in db_infos[name] if x["num_points_in_gt"] >= min_num]
        return db_infos

    def filter_by_difficulty(self, db_infos, removed_difficulty):
        for key in db_infos:
            db_infos[key] = [x for x in db_infos[key] if x.get("difficulty", 0) not in removed_difficulty]
        return db_infos

    def sample_with_fixed_number(self, class_name, sample_group):
        sample_num = sample_group["sample_num"]
        pool = len(self.db_infos[class_name])
        if pool == 0:
            return []
        if sample_group["pointer"] + sample_num >= pool:
            sample_group["indices"] = np.random.permutation(pool)
            sample_group["pointer"] = 0
        idxs = sample_group["indices"][
            sample_group["pointer"] : sample_group["pointer"] + sample_num
        ]
        sample_group["pointer"] += sample_num
        return [self.db_infos[class_name][i] for i in idxs]

    def __call__(self, data_dict):
        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"]
        points = data_dict["points"]
        sampled_boxes_list, sampled_points_list, sampled_names_list = [], [], []

        for class_name, sample_group in self.sample_groups.items():
            num_existing = int((gt_names == class_name).sum())
            num_to_sample = max(sample_group["sample_num"] - num_existing, 0)
            if num_to_sample <= 0:
                continue
            group = dict(sample_group)
            group["sample_num"] = num_to_sample
            sampled = self.sample_with_fixed_number(class_name, sample_group)
            for info in sampled:
                if self.gt_database_data is not None and "global_data_offset" in info:
                    start, end = info["global_data_offset"]
                    obj_points = np.array(self.gt_database_data[start:end], dtype=np.float32)
                else:
                    file_path = self.root_path / info["path"]
                    if not file_path.exists():
                        continue
                    obj_points = np.fromfile(str(file_path), dtype=np.float32).reshape(
                        -1, self.sampler_cfg.get("NUM_POINT_FEATURES", 4)
                    )
                obj_points[:, :3] += info["box3d_lidar"][:3]
                sampled_boxes_list.append(info["box3d_lidar"])
                sampled_points_list.append(obj_points)
                sampled_names_list.append(class_name)

        if sampled_boxes_list:
            sampled_boxes = np.stack(sampled_boxes_list, axis=0)[:, :7]
            points = box_utils.remove_points_in_boxes(points, sampled_boxes)
            sp = np.concatenate(sampled_points_list, axis=0)
            if sp.shape[1] < points.shape[1]:
                sp = np.hstack(
                    [sp, np.zeros((sp.shape[0], points.shape[1] - sp.shape[1]), dtype=sp.dtype)]
                )
            data_dict["points"] = np.concatenate([sp[:, : points.shape[1]], points], axis=0)
            data_dict["gt_boxes"] = np.concatenate([gt_boxes, sampled_boxes], axis=0)
            data_dict["gt_names"] = np.concatenate([gt_names, np.array(sampled_names_list)])
        return data_dict
