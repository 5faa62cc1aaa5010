"""Host-side data processor queue.

Counterpart of /root/reference/pcdet/datasets/processor/data_processor.py:
configured steps applied in order to each sample dict. The voxelization step is
a *placeholder* (grid-size bookkeeping only, data_processor.py:106-114) for all
dynamic-voxel V2X models — actual voxelization happens on device in the VFE.
"""
from functools import partial

import numpy as np

from ...utils import box_utils


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training, num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = self.voxel_size = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            cur_processor = getattr(self, cur_cfg["NAME"])(config=cur_cfg)
            self.data_processor_queue.append(cur_processor)

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        if data_dict.get("points", None) is not None:
            mask = box_utils.mask_points_by_range(data_dict["points"], self.point_cloud_range)
            data_dict["points"] = data_dict["points"][mask]
        if (
            data_dict.get("gt_boxes", None) is not None
            and config.get("REMOVE_OUTSIDE_BOXES", False)
            and self.training
        ):
            mask = box_utils.mask_boxes_outside_range_numpy(
                data_dict["gt_boxes"], self.point_cloud_range,
                min_num_corners=config.get("min_num_corners", 1),
            )
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            if data_dict.get("instances_tf", None) is not None and data_dict["instances_tf"].shape[0] == mask.shape[0]:
                data_dict["instances_tf"] = data_dict["instances_tf"][mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config["SHUFFLE_ENABLED"][self.mode]:
            points = data_dict["points"]
            shuffle_idx = np.random.permutation(points.shape[0])
            data_dict["points"] = points[shuffle_idx]
        return data_dict

    def transform_points_to_voxels_placeholder(self, data_dict=None, config=None):
        # only compute grid size; voxelization is on-device (VFE)
        if data_dict is None:
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / np.array(
                config["VOXEL_SIZE"]
            )
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config["VOXEL_SIZE"]
            return partial(self.transform_points_to_voxels_placeholder, config=config)
        return data_dict

    # kept for config compatibility: hard voxelization is not used by the V2X
    # path; on TPU it is subsumed by the placeholder + on-device dynamic VFE.
    def transform_points_to_voxels(self, data_dict=None, config=None):
        if data_dict is None:
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / np.array(
                config["VOXEL_SIZE"]
            )
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config["VOXEL_SIZE"]
            return partial(self.transform_points_to_voxels, config=config)
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config["NUM_POINTS"][self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict["points"]
        if num_points < len(points):
            pts_depth = np.linalg.norm(points[:, 0:3], axis=1)
            pts_near_flag = pts_depth < 40.0
            far_idxs_choice = np.where(pts_near_flag == 0)[0]
            near_idxs = np.where(pts_near_flag == 1)[0]
            choice = []
            if num_points > len(far_idxs_choice):
                near_idxs_choice = np.random.choice(
                    near_idxs, num_points - len(far_idxs_choice), replace=False
                )
                choice = (
                    np.concatenate((near_idxs_choice, far_idxs_choice), axis=0)
                    if len(far_idxs_choice) > 0
                    else near_idxs_choice
                )
            else:
                choice = np.arange(0, len(points), dtype=np.int32)
                choice = np.random.choice(choice, num_points, replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(0, len(points), dtype=np.int32)
            if num_points > len(points):
                extra_choice = np.random.choice(choice, num_points - len(points), replace=True)
                choice = np.concatenate((choice, extra_choice), axis=0)
            np.random.shuffle(choice)
        data_dict["points"] = points[choice]
        return data_dict

    def forward(self, data_dict):
        for cur_processor in self.data_processor_queue:
            data_dict = cur_processor(data_dict=data_dict)
        return data_dict
