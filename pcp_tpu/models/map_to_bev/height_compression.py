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
        out["spatial_features_stride"] = 8
        return out


class Conv2DCollapse(nn.Module):
    """Learned z-collapse: concat the height slices into channels and reduce
    with Conv+BN+ReLU (reference map_to_bev/conv2d_collapse.py:7-38 +
    model_utils/basic_block_2d.py). Consumes a dense voxel grid
    ``voxel_features_dense`` (B, Z, Y, X, C) — the camera-VFE (frustum-to-
    voxel) output layout in this codebase."""

    model_cfg: Any
    grid_size: Sequence[int]

    @nn.compact
    def __call__(self, batch, train=False):
        dense = batch["voxel_features_dense"]  # (B, Z, Y, X, C)
        b, z, ny, nx, c = dense.shape
        x = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, ny, nx, z * c)
        args = {k.lower(): v for k, v in self.model_cfg.get("ARGS", {}).items()}
        ksize = int(args.get("kernel_size", 1))
        pad = int(args.get("padding", 0))
        x = nn.Conv(int(self.model_cfg["NUM_BEV_FEATURES"]), (ksize, ksize),
                    padding=((pad, pad), (pad, pad)),
                    use_bias=bool(args.get("bias", True)), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        out = dict(batch)
        out["spatial_features"] = nn.relu(x)
        return out
