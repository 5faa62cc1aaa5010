"""Dynamic pillar VFE — TPU-native (padded points -> dense pillar grid).

Re-design of the reference ``DynamicPillarVFE`` / ``PFNLayerV2``
(/root/reference/pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:14-147).
The reference compacts pillars with ``torch.unique`` and pools with
torch_scatter; here the dense 512x512 BEV grid *is* the segment space:

  points (B, N, C) --MLP (MXU)--> per-point features --scatter-max--> (B, P, C)

so the VFE emits the scattered pillar image directly and the downstream
``PointPillarScatter`` is a reshape. Feature assembly matches the reference
bit-for-bit in ordering: [raw features | f_cluster | f_center] (+ distance),
PFN layer = Linear(no bias) -> BatchNorm(eps 1e-3, mom 0.01) -> ReLU ->
segment-max (+ gather-back concat for non-last layers).

Batch statistics for the BN are computed over valid (non-padding, in-range)
points only, matching the reference where padding does not exist.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..model_utils.norm import MaskedBatchNorm


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def transform(self, x, valid_flat, train=False):
        """Linear (no bias) -> BN(1e-3, 0.01, masked) -> ReLU."""
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm, name="linear")(x)
        if self.use_norm:
            x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
                x, mask=valid_flat, use_running_average=not train
            )
        return nn.relu(x)

    def __call__(self, x, pid_flat, valid_flat, num_segments, train=False):
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = self.transform(x, valid_flat, train=train)
        # padding rows must not pollute the max-pool: route them to the drop slot
        pooled = jnp.zeros((num_segments, out_ch), dtype=x.dtype)
        pooled = pooled.at[pid_flat].max(x, mode="drop")
        if self.last_layer:
            return pooled, pooled
        back = pooled[jnp.clip(pid_flat, 0, num_segments - 1)]
        return jnp.concatenate([x, back], axis=-1), pooled


class DynamicPillarVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Sequence[float]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    # sorted pipeline: argsort by pillar id, segment reductions as segmented
    # scans, dense BEV via the Pallas raster-order kernel. The legacy XLA
    # scatter path is kept for differential testing (use_sorted=False).
    use_sorted: bool = True

    def setup(self):
        cfg = self.model_cfg
        num_raw = cfg.get("NUM_RAW_POINT_FEATURES", None) or self.num_point_features
        self.num_raw_point_features = int(num_raw)
        self.use_norm = bool(cfg["USE_NORM"])
        self.with_distance = bool(cfg["WITH_DISTANCE"])
        self.use_absolute_xyz = bool(cfg["USE_ABSLOTE_XYZ"])  # (sic, reference key)
        filters = list(cfg["NUM_FILTERS"])
        self.pfn_layers = [
            PFNLayer(
                out_channels=filters[i],
                use_norm=self.use_norm,
                last_layer=(i >= len(filters) - 1),
                name=f"pfn_{i}",
            )
            for i in range(len(filters))
        ]
        self.num_bev_features = filters[-1]

    def __call__(self, batch, train=False):
        if self.use_sorted:
            return self._forward_sorted(batch, train)
        return self._forward_scatter(batch, train)

    # ------------------------------------------------------- sorted pipeline
    def _coords_and_pid(self, points, mask):
        cfg_range = jnp.asarray(self.point_cloud_range, dtype=jnp.float32)
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        coords = jnp.floor((points[..., 0:2] - cfg_range[0:2]) / jnp.asarray([vx, vy])).astype(
            jnp.int32
        )
        in_range = (
            (coords[..., 0] >= 0)
            & (coords[..., 0] < nx)
            & (coords[..., 1] >= 0)
            & (coords[..., 1] < ny)
        )
        valid = mask & in_range
        coords = jnp.clip(coords, 0, jnp.asarray([nx - 1, ny - 1]))
        pid = jnp.where(valid, coords[..., 1] * nx + coords[..., 0], nx * ny).astype(jnp.int32)
        return coords, valid, pid

    def _forward_sorted(self, batch, train=False):
        from ...ops.pallas.bev_scatter import (bev_scatter_max_sorted,
                                               bev_scatter_max_sorted_fused,
                                               bev_scatter_max_sorted_onehot,
                                               bev_scatter_max_sorted_prereduced,
                                               use_interpret)
        from ...ops.sorted_segments import segment_total_to_points, sort_by_pid

        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        points = batch["points"][..., : self.num_raw_point_features]
        mask = batch["points_mask"]
        b, n = points.shape[0], points.shape[1]

        coords, valid, pid = self._coords_and_pid(points, mask)
        # only the raw points ride the sort as payload; valid/coords are
        # recomputed from pid_s (row gathers cost ~270 ns/row on TPU)
        pid_s, (points_s,), _ = sort_by_pid(pid, [points])
        valid_s = pid_s < nx * ny
        coords_s = jnp.stack(
            [(pid_s % nx).astype(points.dtype), (pid_s // nx).astype(points.dtype)],
            axis=-1,
        )

        xyz = points_s[..., 0:3]
        ones = valid_s[..., None].astype(points.dtype)
        # one fused 4-channel segment total: [sum xyz | count]
        sc = segment_total_to_points(
            jnp.concatenate([xyz * ones, ones], axis=-1), pid_s, jnp.add
        )
        mean = sc[..., :3] / jnp.maximum(sc[..., 3:4], 1.0)
        f_cluster = xyz - mean

        x_offset = vx / 2 + float(self.point_cloud_range[0])
        y_offset = vy / 2 + float(self.point_cloud_range[1])
        z_offset = float(self.voxel_size[2]) / 2 + float(self.point_cloud_range[2])
        f_center = jnp.stack(
            [
                xyz[..., 0] - (coords_s[..., 0] * vx + x_offset),
                xyz[..., 1] - (coords_s[..., 1] * vy + y_offset),
                xyz[..., 2] - z_offset,
            ],
            axis=-1,
        )

        if self.use_absolute_xyz:
            feats = [points_s, f_cluster, f_center]
        else:
            feats = [points_s[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        flat_valid = valid_s.reshape(b * n)
        pooled_pts = None
        for pfn in self.pfn_layers:
            x = pfn.transform(features.reshape(b * n, -1), flat_valid, train=train)
            features = x.reshape(b, n, -1)
            if pfn.last_layer:
                pooled_pts = features
            else:
                back = segment_total_to_points(
                    jnp.where(valid_s[..., None], features, 0.0), pid_s, jnp.maximum
                )
                features = jnp.concatenate([features, back], axis=-1)

        final = jnp.where(valid_s[..., None], pooled_pts, 0.0)
        # PRE_REDUCE: segmented-scan fold + tail-only stores — wins at real
        # cloud occupancy (>= ~4 points/pillar); the default per-point kernel
        # wins on near-unique pillar ids. 'fused' runs the segment reduction
        # inside the Pallas kernel (no XLA-side 64-channel scan).
        pre_reduce = self.model_cfg.get("PRE_REDUCE", False)
        if isinstance(pre_reduce, str) and pre_reduce.lower() == "onehot":
            # MXU one-hot placement: no serial scalar walk at all (~2^-24
            # relative value rounding from the 3-way bf16 split)
            bev = bev_scatter_max_sorted_onehot(
                final, pid_s, ny, nx, interpret=use_interpret())
        elif isinstance(pre_reduce, str) and pre_reduce.lower() == "fused":
            bev = bev_scatter_max_sorted_fused(
                final, pid_s, ny, nx, interpret=use_interpret())
        elif bool(pre_reduce):
            bev = bev_scatter_max_sorted_prereduced(
                final, pid_s, ny, nx, interpret=use_interpret())
        else:
            bev = bev_scatter_max_sorted(final, pid_s, ny, nx, interpret=use_interpret())

        out = dict(batch)
        out["pillar_features"] = bev.reshape(b, ny * nx, -1)
        return out

    # ------------------------------------------------ legacy scatter pipeline
    def _forward_scatter(self, batch, train=False):
        cfg_range = jnp.asarray(self.point_cloud_range, dtype=jnp.float32)
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        num_pillars = nx * ny

        points = batch["points"][..., : self.num_raw_point_features]
        mask = batch["points_mask"]
        b, n = points.shape[0], points.shape[1]

        coords = jnp.floor((points[..., 0:2] - cfg_range[0:2]) / jnp.asarray([vx, vy])).astype(
            jnp.int32
        )
        in_range = (
            (coords[..., 0] >= 0)
            & (coords[..., 0] < nx)
            & (coords[..., 1] >= 0)
            & (coords[..., 1] < ny)
        )
        valid = mask & in_range
        coords = jnp.clip(coords, 0, jnp.asarray([nx - 1, ny - 1]))

        pid = coords[..., 1] * nx + coords[..., 0]  # (B, N), row-major (y, x)
        pid_flat = jnp.where(
            valid, pid + jnp.arange(b, dtype=jnp.int32)[:, None] * num_pillars, b * num_pillars
        ).reshape(-1)
        valid_flat = valid.reshape(-1)

        xyz = points[..., 0:3].reshape(-1, 3)
        xyz_masked = jnp.where(valid_flat[:, None], xyz, 0.0)

        # cluster centers: per-pillar mean xyz, gathered back per point
        sums = jnp.zeros((b * num_pillars, 3), dtype=xyz.dtype).at[pid_flat].add(
            xyz_masked, mode="drop"
        )
        cnt = jnp.zeros((b * num_pillars,), dtype=xyz.dtype).at[pid_flat].add(
            valid_flat.astype(xyz.dtype), mode="drop"
        )
        mean = sums / jnp.maximum(cnt, 1.0)[:, None]
        f_cluster = xyz - mean[jnp.clip(pid_flat, 0, b * num_pillars - 1)]

        # offset from pillar center (reference f_center, dynamic_pillar_vfe.py:113-116)
        x_offset = vx / 2 + float(self.point_cloud_range[0])
        y_offset = vy / 2 + float(self.point_cloud_range[1])
        z_offset = float(self.voxel_size[2]) / 2 + float(self.point_cloud_range[2])
        coords_flat = coords.reshape(-1, 2).astype(xyz.dtype)
        f_center = jnp.stack(
            [
                xyz[:, 0] - (coords_flat[:, 0] * vx + x_offset),
                xyz[:, 1] - (coords_flat[:, 1] * vy + y_offset),
                xyz[:, 2] - z_offset,
            ],
            axis=-1,
        )

        raw = points.reshape(b * n, -1)
        if self.use_absolute_xyz:
            feats = [raw, f_cluster, f_center]
        else:
            feats = [raw[:, 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        pooled = None
        for pfn in self.pfn_layers:
            features, pooled = pfn(features, pid_flat, valid_flat, b * num_pillars, train=train)

        pillar_features = pooled.reshape(b, num_pillars, -1)
        out = dict(batch)
        out["pillar_features"] = pillar_features
        out["pillar_count"] = cnt.reshape(b, num_pillars)
        return out
