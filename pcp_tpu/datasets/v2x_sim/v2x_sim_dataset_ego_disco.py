"""DiscoNet mid-fusion dataset: early-fusion-style points carrying an
``agent_idx`` channel instead of sweep/instance indices, plus per-agent
``se3_from_ego`` 4x4 poses in metadata for BEV feature warping.

Capability match for
/root/reference/pcdet/datasets/v2x_sim/v2x_sim_dataset_ego_disco.py.
"""
import copy
from pathlib import Path

import numpy as np

from ...utils.geometry import se3_inverse, apply_se3
from .source import NUM_AGENTS
from .v2x_sim_dataset_ego import V2XSimDataset_EGO, EGO_LIDAR_ID
from .v2x_sim_utils import get_pseudo_sweeps_of_1lidar


class V2XSimDataset_EGO_DISCO(V2XSimDataset_EGO):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, source=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, source)
        self.exchange_database = None
        if self.dataset_cfg.get("EXCHANGE_PREVIOUS", False):
            self.infos = [
                info
                for info in self.infos
                if self.source.sample_record(info["token"])["prev"] != ""
            ]

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])

        ego_stuff = get_pseudo_sweeps_of_1lidar(
            self.source, info["lidar_token"], self.num_historical_sweeps,
            self.classes_of_interest,
            threshold_boxes_by_points=self.dataset_cfg.get("THRESHOLD_BOXES_BY_POINTS", 5),
        )
        points = ego_stuff["points"]
        # point-5 | agent_idx (ego == 1)
        points = np.concatenate(
            [points[:, :5], np.ones((points.shape[0], 1)) * EGO_LIDAR_ID], axis=1
        )
        gt_boxes = info.get("gt_boxes", ego_stuff["gt_boxes"])
        gt_names = info.get("gt_names", ego_stuff["gt_names"])
        num_original = points.shape[0]

        target_se3_glob = se3_inverse(self.source.get_pose(info["lidar_token"]))

        sample = self.source.sample_record(info["token"])
        if self.dataset_cfg.get("EXCHANGE_PREVIOUS", False):
            sample = self.source.sample_record(sample["prev"])
        exchange_metadata = {i: 0.0 for i in range(NUM_AGENTS) if i != EGO_LIDAR_ID}
        exchange_points, se3_from_ego = [], {}
        for lidar_name, lidar_token in sample["data"].items():
            if not lidar_name.startswith("LIDAR_TOP_id_"):
                continue
            lidar_id = int(lidar_name.split("_")[-1])
            if lidar_id == EGO_LIDAR_ID:
                continue
            xstuff = get_pseudo_sweeps_of_1lidar(
                self.source, lidar_token, self.num_historical_sweeps,
                self.classes_of_interest,
                threshold_boxes_by_points=self.dataset_cfg.get("THRESHOLD_BOXES_BY_POINTS", 1),
            )
            xpoints = xstuff["points"]
            xpoints = np.concatenate(
                [xpoints[:, :5], np.zeros((xpoints.shape[0], 1)) + lidar_id], axis=1
            )
            if self.dataset_cfg.get("EXCHANGE_CURRENT_ONLY", False) and xpoints.shape[0]:
                pass  # agent_idx replaced sweep channel; current-only filter is a no-op here
            target_se3_lidar = target_se3_glob @ self.source.get_pose(lidar_token)
            xpoints[:, :3] = apply_se3(target_se3_lidar, points=xpoints[:, :3])
            exchange_metadata[lidar_id] = xpoints.shape[0]
            exchange_points.append(xpoints)
            se3_from_ego[lidar_id] = se3_inverse(target_se3_lidar)

        if exchange_points:
            points = np.concatenate([points, *exchange_points], axis=0)

        input_dict = {
            "points": points,
            "gt_boxes": np.asarray(gt_boxes, dtype=np.float64)[:, :7],
            "gt_names": np.asarray(gt_names),
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {
                "lidar_token": info["lidar_token"],
                "num_sweeps_target": self.num_sweeps,
                "sample_token": info["token"],
                "lidar_id": EGO_LIDAR_ID,
                "num_original": num_original,
                "exchange": exchange_metadata,
                "se3_from_ego": se3_from_ego,
            },
        }
        data_dict = self.prepare_data(data_dict=input_dict)
        # device-side pose arrays (built AFTER augmentation so se3_from_ego
        # reflects world flips/rotations applied by the augmentor)
        se3_arr = np.tile(np.eye(4, dtype=np.float32)[None], (6, 1, 1))
        present = np.zeros(6, dtype=bool)
        for lid, tf in data_dict["metadata"]["se3_from_ego"].items():
            se3_arr[lid] = tf.astype(np.float32)
            present[lid] = True
        present[1] = True  # ego
        data_dict["se3_from_ego_arr"] = se3_arr
        data_dict["agent_present"] = present
        return data_dict
