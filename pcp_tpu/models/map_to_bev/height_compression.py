"""HeightCompression: sparse 3D tensor -> dense BEV, folding z into channels.

Capability match for /root/reference/pcdet/models/backbones_2d/map_to_bev/
height_compression.py:10-26.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse3d import sparse_to_dense


class HeightCompression(nn.Module):
    model_cfg: Any
    grid_size: Sequence[int]

    def __call__(self, batch, train=False):
        ids, feats = batch["encoded_spconv_tensor"]
        nz, ny, nx = batch["encoded_spconv_dims"]
        dense = sparse_to_dense(ids, feats, (nz, ny, nx))  # (B, nz, ny, nx, C)
        b = dense.shape[0]
        # fold D into C, channel-major (channel = c * nz + z) to match the
        # reference's view(N, C*D, H, W) ordering — keeps torch_converter
        # parity for the first 2D conv of SECOND models
        bev = jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, ny, nx, -1)
        assert bev.shape[-1] == int(self.model_cfg["NUM_BEV_FEATURES"]), (
            bev.shape, self.model_cfg["NUM_BEV_FEATURES"],
        )
        out = dict(batch)
        out["spatial_features"] = bev
        return out
