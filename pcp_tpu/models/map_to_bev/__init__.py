from .pointpillar_scatter import PointPillarScatter
from .height_compression import Conv2DCollapse, HeightCompression

__all__ = {
    "PointPillarScatter": PointPillarScatter,
    "HeightCompression": HeightCompression,
    "Conv2DCollapse": Conv2DCollapse,
}


def build_map_to_bev(cfg, info, name="map_to_bev"):
    cls = __all__[cfg["NAME"]]
    return cls(model_cfg=cfg, grid_size=info.grid_size, name=name)
