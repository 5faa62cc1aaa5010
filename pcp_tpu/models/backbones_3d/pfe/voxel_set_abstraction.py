"""Voxel Set Abstraction — PV-RCNN's keypoint feature extractor.

Behavioral counterpart of
/root/reference/pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:124-432:
FPS keypoints from raw points, then per-source aggregation — bilinear BEV
interpolation, a StackSAModuleMSG over raw points, and one over each sparse
conv level's voxel centers — concatenated and fused by Linear+BN+ReLU.

TPU redesign: every source already lives in a padded batch layout
((B, N, C) points with mask, (B, V) sorted voxel ids with budget padding), so
the reference's per-sample batch_cnt bookkeeping and the "stack" kernel
flavour disappear; each aggregation is the shared PointnetSAModuleMSG with
`new_xyz=keypoints`. FPS keypoint selection duplicates valid points when a
cloud has fewer than NUM_KEYPOINTS (reference wrap, :259-262).
"""
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ....ops import pointnet2 as pn2
from ....ops import sparse3d
from ...model_utils.norm import MaskedBatchNorm
from ..pointnet2_modules import PointnetSAModuleMSG


def get_voxel_centers_from_ids(ids, dims, downsample, voxel_size, pc_range):
    """Flat sorted ids (B, V) -> centers (B, V, 3) xyz + validity (B, V)."""
    nz, ny, nx = dims
    valid = ids < nz * ny * nx
    z, y, x = sparse3d.decode_ids(jnp.where(valid, ids, 0), dims)
    vs = jnp.asarray(voxel_size, jnp.float32) * float(downsample)
    mins = jnp.asarray(pc_range[0:3], jnp.float32)
    centers = jnp.stack(
        [x.astype(jnp.float32), y.astype(jnp.float32), z.astype(jnp.float32)], axis=-1)
    return (centers + 0.5) * vs + mins, valid


def bilinear_interpolate_bev(bev, xy_idx):
    """bev (B, H, W, C) NHWC, xy_idx (B, K, 2) fractional (x, y) grid coords.

    Matches the reference bilinear_interpolate_torch (:11-42) incl. border
    clamping of the four corners."""
    h, w = bev.shape[1:3]
    x, y = xy_idx[..., 0], xy_idx[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    def gather(yi, xi):
        flat = bev.reshape(bev.shape[0], h * w, -1)
        return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

    ia, ib = gather(y0, x0), gather(y1, x0)
    ic, id_ = gather(y0, x1), gather(y1, x1)
    wa = ((x1 - x) * (y1 - y))[..., None]
    wb = ((x1 - x) * (y - y0))[..., None]
    wc = ((x - x0) * (y1 - y))[..., None]
    wd = ((x - x0) * (y - y0))[..., None]
    return ia * wa + ib * wb + ic * wc + id_ * wd


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    num_bev_features: Optional[int] = None
    num_rawpoint_features: int = 4

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        cfg = self.model_cfg
        sa_cfg = cfg["SA_LAYER"]
        assert cfg.get("POINT_SOURCE", "raw_points") == "raw_points"

        points = out["points"]
        mask = out["points_mask"]
        xyz = points[..., 0:3]
        sample_method = cfg.get("SAMPLE_METHOD", "FPS")
        if sample_method == "SPC":
            # sectorized proposal-centric sampling (reference :206-225 +
            # sample_points_with_roi :45-76): restrict candidates to points
            # within roi_max_dim/2 + radius of any proposal, then FPS. The
            # reference's per-sector quota exists to parallelize its CUDA
            # FPS; a single masked FPS over the same candidate set is the
            # TPU equivalent (one kernel, identical spatial spread).
            spc = cfg["SPC_SAMPLING"]
            rois = out["rois"][..., :7]
            d = jnp.linalg.norm(
                xyz[:, :, None, :] - rois[:, None, :, 0:3], axis=-1)  # (B,N,R)
            roi_valid = jnp.any(rois != 0, axis=-1)  # (B,R)
            d = jnp.where(roi_valid[:, None, :], d, 1e9)
            min_d = jnp.min(d, axis=-1)
            nearest = jnp.argmin(d, axis=-1)
            half_diag = jnp.linalg.norm(
                jnp.take_along_axis(rois[..., 3:6], nearest[..., None], axis=1) / 2,
                axis=-1)
            near_roi = min_d < half_diag + float(spc["SAMPLE_RADIUS_WITH_ROI"])
            cand = mask & near_roi
            # degenerate no-proposal case: fall back to all valid points
            cand = jnp.where(jnp.any(cand, axis=1, keepdims=True), cand, mask)
            kp_idx = pn2.farthest_point_sample(xyz, int(cfg["NUM_KEYPOINTS"]), cand)
            kp_mask = jnp.take_along_axis(cand, kp_idx, axis=1)
        else:
            assert sample_method == "FPS", sample_method
            kp_idx = pn2.farthest_point_sample(xyz, int(cfg["NUM_KEYPOINTS"]), mask)
            kp_mask = jnp.take_along_axis(mask, kp_idx, axis=1)
        keypoints = pn2.gather_points(xyz, kp_idx)  # (B, K, 3)

        feats_list = []
        sources = list(cfg["FEATURES_SOURCE"])
        if "bev" in sources:
            vs = jnp.asarray(self.voxel_size[0:2], jnp.float32)
            mins = jnp.asarray(self.point_cloud_range[0:2], jnp.float32)
            stride = float(out.get("spatial_features_stride", 8))
            xy = (keypoints[..., 0:2] - mins) / vs / stride
            feats_list.append(bilinear_interpolate_bev(out["spatial_features"], xy))

        def aggregate(src_cfg, name, s_xyz, s_feats, s_mask, in_channels):
            """StackSAModuleMSG or VectorPoolAggregationModuleMSG per config."""
            if src_cfg.get("NAME") == "VectorPoolAggregationModuleMSG":
                from ..vector_pool import VectorPoolAggregationModuleMSG

                vp = VectorPoolAggregationModuleMSG(
                    input_channels=in_channels, config=src_cfg, name=name)
                return vp(s_xyz, s_feats, s_mask, keypoints, kp_mask, train=train)
            # npoint is only a mode switch here (non-None = "use the explicit
            # new_xyz we pass"); the keypoint count fixes the output shape
            sa = PointnetSAModuleMSG(
                npoint=int(cfg["NUM_KEYPOINTS"]),
                radii=[float(r) for r in src_cfg["POOL_RADIUS"]],
                nsamples=[int(n) for n in src_cfg["NSAMPLE"]],
                mlps=[list(m) for m in src_cfg["MLPS"]],
                use_xyz=True, name=name)
            _, pooled, _ = sa(s_xyz, s_feats, mask=s_mask,
                              new_xyz=keypoints, new_mask=kp_mask, train=train)
            return pooled

        if "raw_points" in sources:
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            feats_list.append(aggregate(
                sa_cfg["raw_points"], "sa_rawpoints", xyz, raw_feats, mask,
                max(points.shape[-1] - 3, 1)))

        for src in sources:
            if src in ("bev", "raw_points"):
                continue
            ids, vfeat, dims, ds_cfg = out["multi_scale_3d_features"][src]
            ds = int(sa_cfg[src]["DOWNSAMPLE_FACTOR"])
            centers, vvalid = get_voxel_centers_from_ids(
                ids, dims, ds, self.voxel_size, self.point_cloud_range)
            feats_list.append(aggregate(
                sa_cfg[src], f"sa_{src}", centers, vfeat, vvalid, vfeat.shape[-1]))

        before_fusion = jnp.concatenate(feats_list, axis=-1)  # (B, K, C_in)
        h = nn.Dense(int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False, name="fusion")(
            before_fusion)
        h = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name="fusion_bn")(
            h, mask=kp_mask, use_running_average=not train)
        h = nn.relu(h)

        out["point_features_before_fusion"] = before_fusion
        out["point_features"] = h
        out["point_coords"] = keypoints
        out["point_coords_mask"] = kp_mask
        return out
