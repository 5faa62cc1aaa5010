from .voxel_set_abstraction import VoxelSetAbstraction

__all__ = {
    "VoxelSetAbstraction": VoxelSetAbstraction,
}


def build_pfe(cfg, info, num_bev_features, num_rawpoint_features, name="pfe"):
    try:
        cls = __all__[cfg["NAME"]]
    except KeyError:
        raise NotImplementedError(f"PFE {cfg['NAME']!r} is not implemented in pcp_tpu")
    return cls(model_cfg=cfg, voxel_size=info.voxel_size,
               point_cloud_range=info.point_cloud_range,
               num_bev_features=num_bev_features,
               num_rawpoint_features=num_rawpoint_features, name=name)
