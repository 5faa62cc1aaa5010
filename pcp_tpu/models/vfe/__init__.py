from .dynamic_pillar_vfe import DynamicPillarVFE
from .image_vfe import ImageVFE
from .dynamic_mean_vfe import DynamicMeanVFE

# MeanVFE / PillarVFE (the reference's hard-voxelization flavours,
# /root/reference/pcdet/models/backbones_3d/vfe/mean_vfe.py, pillar_vfe.py)
# resolve to the dynamic device-side implementations: hard voxelization
# exists in the reference only because its CUDA VFEs want a precomputed
# (num_voxels, max_points, C) buffer from the dataloader; dynamic voxelization
# computes the identical mean/PFN features without the MAX_POINTS_PER_VOXEL /
# MAX_NUMBER_OF_VOXELS truncation (a strict superset of the information — the
# same equivalence pcdet itself documents for its Dyn* variants).
__all__ = {
    "DynPillarVFE": DynamicPillarVFE,
    "DynamicPillarVFE": DynamicPillarVFE,
    "PillarVFE": DynamicPillarVFE,
    "DynMeanVFE": DynamicMeanVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
    "MeanVFE": DynamicMeanVFE,
    "ImageVFE": ImageVFE,
}


def build_vfe(vfe_cfg, info, name="vfe"):
    cls = __all__[vfe_cfg["NAME"]]
    return cls(
        name=name,
        model_cfg=vfe_cfg,
        num_point_features=info.num_point_features,
        voxel_size=info.voxel_size,
        grid_size=info.grid_size,
        point_cloud_range=info.point_cloud_range,
    )
