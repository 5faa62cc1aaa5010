"""Late fusion (eval-only) dataset: gathers each agent's predicted boxes from
the exchange database into ``metadata['exchange_boxes']`` with dummy points;
the V2XLateFusion "detector" NMS-merges them.

Capability match for
/root/reference/pcdet/datasets/v2x_sim/v2x_sim_dataset_ego_late.py: ego
prediction read at the current keyframe; other agents at ``EXCHANGE_SETTING``
('now' or 'prev', with scene-flow propagation in the 'prev' case).
"""
import copy
from pathlib import Path

import numpy as np

from ...utils.geometry import se3_inverse, apply_se3
from .v2x_sim_dataset_ego import V2XSimDataset_EGO, EGO_LIDAR_ID


class V2XSimDataset_EGO_LATE(V2XSimDataset_EGO):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, source=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, source)
        assert self.mode == "test", "late fusion only supports validation"

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        gt_boxes = info.get("gt_boxes", np.zeros((0, 7)))
        gt_names = info.get("gt_names", np.zeros((0,), dtype="<U16"))

        ego_se3_glob = se3_inverse(self.source.get_pose(info["lidar_token"]))
        sample_token = info["token"]
        sample = self.source.sample_record(sample_token)

        exchange_boxes, exchange_metadata = {}, {}
        ego_modar = self.exchange_database[EGO_LIDAR_ID].load_modar(sample_token, EGO_LIDAR_ID)
        if ego_modar is None:
            ego_modar = np.zeros((0, 9))
        exchange_boxes[EGO_LIDAR_ID] = ego_modar
        exchange_metadata[EGO_LIDAR_ID] = ego_modar.shape[0]

        setting = self.dataset_cfg.get("EXCHANGE_SETTING", "prev")
        assert setting in ("now", "prev"), f"EXCHANGE_SETTING := {setting} is unknown"
        exch_token = sample_token if setting == "now" else sample["prev"]

        if exch_token != "":
            exch_sample = self.source.sample_record(exch_token)
            for lidar_name, lidar_token in exch_sample["data"].items():
                if not lidar_name.startswith("LIDAR_TOP_id_"):
                    continue
                lidar_id = int(lidar_name.split("_")[-1])
                if lidar_id == EGO_LIDAR_ID:
                    continue
                modar, _ = self._load_and_propagate_modar(
                    exch_token, lidar_id,
                    propagate=(setting == "prev") and self.flow_propagation,
                    lidar_token=lidar_token,
                )
                if modar is None:
                    modar = np.zeros((0, 9))
                if modar.shape[0]:
                    ego_se3_lidar = ego_se3_glob @ self.source.get_pose(lidar_token)
                    modar[:, :7] = apply_se3(ego_se3_lidar, boxes=modar[:, :7])
                exchange_boxes[lidar_id] = modar
                exchange_metadata[lidar_id] = modar.shape[0]

        input_dict = {
            "points": np.zeros((1, 7)),  # dummy
            "gt_boxes": np.asarray(gt_boxes, dtype=np.float64)[:, :7],
            "gt_names": np.asarray(gt_names),
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {
                "lidar_token": info["lidar_token"],
                "num_sweeps_target": self.num_sweeps,
                "sample_token": sample_token,
                "lidar_id": EGO_LIDAR_ID,
                "num_original": 0,
                "exchange": exchange_metadata,
                "exchange_boxes": exchange_boxes,
            },
        }
        return self.prepare_data(data_dict=input_dict)
