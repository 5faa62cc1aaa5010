from .pointpillar_scatter import PointPillarScatter

__all__ = {
    "PointPillarScatter": PointPillarScatter,
}


def build_map_to_bev(cfg, info, name="map_to_bev"):
    cls = __all__[cfg["NAME"]]
    return cls(model_cfg=cfg, grid_size=info.grid_size, name=name)
