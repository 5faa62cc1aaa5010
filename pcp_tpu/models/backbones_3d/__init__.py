from .focal_sparse import VoxelBackBone8xFocal
from .pillar_backbone_2d import PillarBackBone8x, PillarRes18BackBone8x
from .pointnet2_backbone import PointNet2MSG
from .spconv_backbone import UNetV2, VoxelBackBone8x, VoxelResBackBone8x

__all__ = {
    "PillarBackBone8x": PillarBackBone8x,
    "PillarRes18BackBone8x": PillarRes18BackBone8x,
    "PointNet2MSG": PointNet2MSG,
    "UNetV2": UNetV2,
    "VoxelBackBone8x": VoxelBackBone8x,
    "VoxelBackBone8xFocal": VoxelBackBone8xFocal,
    "VoxelResBackBone8x": VoxelResBackBone8x,
}


def build_backbone_3d(cfg, info, num_point_features, name="backbone_3d"):
    try:
        cls = __all__[cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"BACKBONE_3D {cfg['NAME']!r} is not implemented in pcp_tpu")
    return cls(model_cfg=cfg, info=info, num_point_features=num_point_features, name=name)
