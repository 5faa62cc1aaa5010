from .dynamic_pillar_vfe import DynamicPillarVFE
from .dynamic_mean_vfe import DynamicMeanVFE

__all__ = {
    "DynPillarVFE": DynamicPillarVFE,
    "DynamicPillarVFE": DynamicPillarVFE,
    "DynMeanVFE": DynamicMeanVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
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
