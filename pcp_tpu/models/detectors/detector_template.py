"""Config-driven detector builder.

Functional counterpart of the reference ``Detector3DTemplate``
(/root/reference/pcdet/models/detectors/detector3d_template.py:27-234): a fixed
module topology instantiated from the MODEL config, with each module reading /
extending a batch pytree. Under flax the "template" is a Module whose setup()
builds the sub-modules present in the config; the forward threads an immutable
dict through them.

Module topology (reference order):
  bev_maker_rsu, bev_maker_car, bev_maker_early, vfe, backbone_3d,
  map_to_bev, pfe, backbone_2d, corrector, v2x_mid_fusion, dense_head
"""
import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    """Static dataset geometry the model builder needs (the reference threads
    these through ``model_info_dict``)."""

    class_names: Tuple[str, ...]
    num_point_features: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    grid_size: Tuple[int, ...]  # (nx, ny, nz)

    @classmethod
    def from_data_cfg(cls, data_cfg, class_names):
        pc_range = tuple(float(v) for v in data_cfg["POINT_CLOUD_RANGE"])
        voxel_size = None
        for proc in data_cfg.get("DATA_PROCESSOR", []):
            if "VOXEL_SIZE" in proc:
                voxel_size = tuple(float(v) for v in proc["VOXEL_SIZE"])
        if voxel_size is None:
            voxel_size = (0.2, 0.2, pc_range[5] - pc_range[2])
        grid = tuple(
            int(round((pc_range[3 + i] - pc_range[i]) / voxel_size[i])) for i in range(3)
        )
        num_feats = len(data_cfg["POINT_FEATURE_ENCODING"]["used_feature_list"])
        return cls(
            class_names=tuple(class_names),
            num_point_features=num_feats,
            point_cloud_range=pc_range,
            voxel_size=voxel_size,
            grid_size=grid,
        )


class Detector3DTemplate(nn.Module):
    """Base class: builds sub-modules from cfg; subclasses define forward."""

    model_cfg: Any
    num_class: int
    dataset_info: DatasetInfo

    def build_module_list(self):
        # local imports avoid circular registry imports at module load
        from ..vfe import build_vfe
        from ..map_to_bev import build_map_to_bev
        from ..backbones_2d import build_backbone_2d
        from ..backbones_3d import build_backbone_3d
        from ..dense_heads import build_dense_head
        from ..bev_layers import build_corrector, build_bev_maker, build_v2x_fusion

        info = self.dataset_info
        cfg = self.model_cfg
        # MODEL.BF16: True -> conv stacks (backbone_2d + dense head) compute
        # in bfloat16 with f32 params/logits
        bf16 = bool(cfg.get("BF16", False))
        modules = []
        num_bev_features = None
        num_point_features = info.num_point_features

        for name in ("BEV_MAKER_RSU", "BEV_MAKER_CAR", "BEV_MAKER_EARLY"):
            if cfg.get(name) is not None:
                modules.append(build_bev_maker(cfg[name], info, role=name.lower()))
        if cfg.get("TEACHER") is not None:
            from ..bev_layers.teacher import Teacher

            modules.append(Teacher(model_cfg=cfg["TEACHER"], info=info, name="teacher"))

        if cfg.get("VFE") is not None:
            vfe = build_vfe(cfg["VFE"], info)
            modules.append(vfe)
            if cfg["VFE"].get("NUM_FILTERS"):  # PFN output; mean VFEs keep raw width
                num_point_features = int(list(cfg["VFE"]["NUM_FILTERS"])[-1])
            else:
                num_point_features = int(
                    cfg["VFE"].get("NUM_POINT_FEATURES", info.num_point_features)
                )
        if cfg.get("BACKBONE_3D") is not None:
            b3d = build_backbone_3d(cfg["BACKBONE_3D"], info, num_point_features)
            modules.append(b3d)
            if cfg["BACKBONE_3D"].get("FP_MLPS"):  # PointNet2 family
                num_point_features = int(list(cfg["BACKBONE_3D"]["FP_MLPS"][0])[-1])
            elif cfg["BACKBONE_3D"]["NAME"] == "UNetV2":
                num_point_features = 16  # decoder output width (spconv_unet.py:133)
        if cfg.get("MAP_TO_BEV") is not None:
            m2b = build_map_to_bev(cfg["MAP_TO_BEV"], info)
            modules.append(m2b)
            num_bev_features = int(cfg["MAP_TO_BEV"]["NUM_BEV_FEATURES"])
        if cfg.get("PFE") is not None:
            from ..backbones_3d.pfe import build_pfe

            modules.append(
                build_pfe(cfg["PFE"], info, num_bev_features,
                          info.num_point_features, name="pfe")
            )
            num_point_features = int(cfg["PFE"]["NUM_OUTPUT_FEATURES"])
        if cfg.get("BACKBONE_2D") is not None:
            b2d = build_backbone_2d(cfg["BACKBONE_2D"], num_bev_features, bf16=bf16)
            modules.append(b2d)
            ups = list(cfg["BACKBONE_2D"].get("NUM_UPSAMPLE_FILTERS", []))
            filters = list(cfg["BACKBONE_2D"].get("NUM_FILTERS", []))
            num_bev_features = sum(ups) if ups else (filters[-1] if filters else num_bev_features)
        if cfg.get("CORRECTOR") is not None:
            modules.append(build_corrector(cfg["CORRECTOR"], info, num_bev_features))
        if cfg.get("V2X_MID_FUSION") is not None:
            modules.append(build_v2x_fusion(cfg["V2X_MID_FUSION"], info, num_bev_features))
        if cfg.get("DENSE_HEAD") is not None:
            modules.append(
                build_dense_head(
                    cfg["DENSE_HEAD"], info, num_bev_features, self.num_class,
                    predict_boxes_when_training=cfg.get("ROI_HEAD") is not None,
                    bf16=bf16, name="dense_head",
                )
            )
        if cfg.get("POINT_HEAD") is not None:
            from ..dense_heads import build_point_head

            modules.append(
                build_point_head(
                    cfg["POINT_HEAD"], num_point_features, self.num_class,
                    predict_boxes_when_training=cfg.get("ROI_HEAD") is not None,
                    name="point_head",
                )
            )
        if cfg.get("ROI_HEAD") is not None:
            from ..roi_heads import build_roi_head

            modules.append(
                build_roi_head(
                    cfg["ROI_HEAD"], self.num_class, num_point_features,
                    info=info, name="roi_head",
                )
            )
        return modules
