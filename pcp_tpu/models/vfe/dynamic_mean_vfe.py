"""Dynamic 3D mean VFE (SECOND family).

Capability match for /root/reference/pcdet/models/backbones_3d/vfe/
dynamic_mean_vfe.py:42-79: voxelize points on the 3D grid and mean-pool their
features per voxel. TPU re-design: sort by voxel id, segmented mean scans,
compact the segment heads into a fixed-budget sparse tensor (ids, feats)
consumed by the sparse 3D backbone.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sorted_segments import (
    segment_start_flags,
    segment_total_to_points,
    sort_by_pid,
)


class DynamicMeanVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Sequence[float]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]

    def __call__(self, batch, train=False):
        nx, ny, nz = (int(v) for v in self.grid_size)
        nzp = nz + 1  # reference sparse_shape adds one z slice
        vx, vy, vz = (float(v) for v in self.voxel_size)
        lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)

        num_feats = int(self.model_cfg.get("NUM_POINT_FEATURES", self.num_point_features))
        points = batch["points"][..., :num_feats]
        mask = batch["points_mask"]
        b, n = points.shape[0], points.shape[1]
        limit = nzp * ny * nx

        coords = jnp.floor((points[..., 0:3] - lo) / jnp.asarray([vx, vy, vz])).astype(jnp.int32)
        in_range = (
            (coords[..., 0] >= 0) & (coords[..., 0] < nx)
            & (coords[..., 1] >= 0) & (coords[..., 1] < ny)
            & (coords[..., 2] >= 0) & (coords[..., 2] < nz)
        )
        valid = mask & in_range
        coords = jnp.clip(coords, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        vid = (coords[..., 2] * ny + coords[..., 1]) * nx + coords[..., 0]
        vid = jnp.where(valid, vid, limit).astype(jnp.int32)

        vid_s, (pts_s, valid_s), _ = sort_by_pid(vid, [points, valid[..., None]])
        valid_s = valid_s[..., 0].astype(bool)
        ones = valid_s[..., None].astype(points.dtype)
        # fused (C+1)-channel segment total: [sum feats | count], gather-free
        sc = segment_total_to_points(jnp.concatenate([pts_s * ones, ones], axis=-1), vid_s, jnp.add)
        sums, cnt = sc[..., :-1], sc[..., -1:]
        means = sums / jnp.maximum(cnt, 1.0)

        # compact segment heads to the voxel budget
        budget = int(self.model_cfg.get("MAX_VOXELS", min(n, 32768)))
        is_first = segment_start_flags(vid_s) & valid_s
        key = jnp.where(is_first, jnp.arange(n, dtype=jnp.int32)[None], n)
        order = jnp.argsort(key, axis=1)[:, :budget]
        ids = jnp.take_along_axis(jnp.where(is_first, vid_s, limit), order, axis=1)
        feats = jnp.take_along_axis(means, order[..., None], axis=1)
        feats = jnp.where((ids < limit)[..., None], feats, 0.0)

        out = dict(batch)
        out["voxel_ids"] = ids  # (B, V) sorted per sample (firsts are in id order)
        out["voxel_features"] = feats  # (B, V, C)
        out["sparse_dims"] = (nzp, ny, nx)
        return out
