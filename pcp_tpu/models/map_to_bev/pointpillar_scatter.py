"""Map-to-BEV: pillar grid -> dense BEV image.

In the reference, ``PointPillarScatter``
(/root/reference/pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py:14-37)
scatters the sparse pillar list into a dense (B, C, ny, nx) image. Our VFE
already pools into the dense grid (see vfe/dynamic_pillar_vfe.py), so this
module is a pure reshape to the NHWC BEV layout — kept as a module so the
config-driven builder surface (MAP_TO_BEV: PointPillarScatter) is preserved.
"""
from typing import Any, Sequence

import flax.linen as nn


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Sequence[int]

    def __call__(self, batch, train=False):
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        pillar_features = batch["pillar_features"]  # (B, ny*nx, C)
        b, _, c = pillar_features.shape
        assert c == int(self.model_cfg["NUM_BEV_FEATURES"])
        out = dict(batch)
        out["spatial_features"] = pillar_features.reshape(b, ny, nx, c)
        return out
