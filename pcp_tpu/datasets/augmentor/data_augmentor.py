"""Config-driven augmentation queue.

Counterpart of /root/reference/pcdet/datasets/augmentor/data_augmentor.py:26-247
— each AUG_CONFIG_LIST entry becomes a partial applied in order, honoring
DISABLE_AUG_LIST.
"""
from functools import partial

import numpy as np

from . import augmentor_utils


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        aug_config_list = (
            augmentor_configs
            if isinstance(augmentor_configs, list)
            else augmentor_configs["AUG_CONFIG_LIST"]
        )
        for cur_cfg in aug_config_list:
            if not isinstance(augmentor_configs, list):
                if cur_cfg["NAME"] in augmentor_configs["DISABLE_AUG_LIST"]:
                    continue
            cur_augmentor = getattr(self, cur_cfg["NAME"])(config=cur_cfg)
            self.data_augmentor_queue.append(cur_augmentor)

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        for cur_axis in config["ALONG_AXIS_LIST"]:
            assert cur_axis in ["x", "y"]
            enable = getattr(augmentor_utils, "random_flip_along_%s" % cur_axis)(data_dict)
            data_dict["flip_%s" % cur_axis] = enable
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config["WORLD_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple, np.ndarray)):
            rot_range = [-rot_range, rot_range]
        noise_rot = augmentor_utils.global_rotation(data_dict, rot_range)
        data_dict["noise_rot"] = noise_rot
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        noise_scale = augmentor_utils.global_scaling(data_dict, config["WORLD_SCALE_RANGE"])
        data_dict["noise_scale"] = noise_scale
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_translation, config=config)
        augmentor_utils.global_translation(data_dict, config["NOISE_TRANSLATE_STD"])
        return data_dict

    def random_local_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_translation, config=config)
        data_dict["gt_boxes"], data_dict["points"] = augmentor_utils.random_local_translation(
            data_dict["gt_boxes"], data_dict["points"],
            config["LOCAL_TRANSLATION_RANGE"], config["ALONG_AXIS_LIST"],
        )
        return data_dict

    def random_local_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_rotation, config=config)
        rot_range = config["LOCAL_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple, np.ndarray)):
            rot_range = [-rot_range, rot_range]
        data_dict["gt_boxes"], data_dict["points"] = augmentor_utils.local_rotation(
            data_dict["gt_boxes"], data_dict["points"], rot_range
        )
        return data_dict

    def random_local_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_scaling, config=config)
        data_dict["gt_boxes"], data_dict["points"] = augmentor_utils.local_scaling(
            data_dict["gt_boxes"], data_dict["points"], config["LOCAL_SCALE_RANGE"]
        )
        return data_dict

    def random_world_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_frustum_dropout, config=config)
        for direction in config["DIRECTION"]:
            assert direction in ("top", "bottom", "left", "right")
            data_dict["gt_boxes"], data_dict["points"] = augmentor_utils.global_frustum_dropout(
                data_dict["gt_boxes"], data_dict["points"], config["INTENSITY_RANGE"], direction
            )
        return data_dict

    def random_local_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_frustum_dropout, config=config)
        for direction in config["DIRECTION"]:
            assert direction in ("top", "bottom", "left", "right")
            data_dict["gt_boxes"], data_dict["points"] = augmentor_utils.local_frustum_dropout(
                data_dict["gt_boxes"], data_dict["points"], config["INTENSITY_RANGE"], direction
            )
        return data_dict

    def random_local_pyramid_aug(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_pyramid_aug, config=config)
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        gt, pts, keep = augmentor_utils.local_pyramid_dropout(gt, pts, config["DROP_PROB"])
        gt, pts, keep = augmentor_utils.local_pyramid_sparsify(
            gt, pts, config["SPARSIFY_PROB"], config["SPARSIFY_MAX_NUM"], keep
        )
        gt, pts = augmentor_utils.local_pyramid_swap(
            gt, pts, config["SWAP_PROB"], config["SWAP_MAX_NUM"], keep
        )
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def gt_sampling(self, config=None):
        from .database_sampler import DataBaseSampler

        return DataBaseSampler(
            root_path=self.root_path, sampler_cfg=config, class_names=self.class_names,
            logger=self.logger,
        )

    def forward(self, data_dict):
        for cur_augmentor in self.data_augmentor_queue:
            data_dict = cur_augmentor(data_dict=data_dict)
        if "gt_boxes" in data_dict:
            data_dict["gt_boxes"][:, 6] = np.arctan2(
                np.sin(data_dict["gt_boxes"][:, 6]), np.cos(data_dict["gt_boxes"][:, 6])
            )
        return data_dict
