"""VectorPool aggregation (PV-RCNN++'s local-vector feature learning).

Behavioral counterpart of
/root/reference/pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py:247-409
(VectorPoolAggregationModule / ...MSG) + vector_pool_gpu.cu: around every
query point a (kx, ky, kz) lattice of local-voxel centers samples the support
set — 'local_interpolation' 3-NN-interpolates support features at each center
(plus the 9 relative-neighbor-position channels), 'voxel_avg_pool' averages
the support points falling into each local voxel — then a per-voxel grouped
linear (the reference's groups=total_voxels Conv1d) and shared post-MLPs.

TPU redesign: the hashed CUDA neighbor lookup becomes one ball-query gather
of `neighbor_nsample` support points per query; all per-voxel work is a
batched (B, Q, V, S) distance tensor over that gathered set.
"""
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import pointnet2 as pn2
from ..model_utils.norm import MaskedBatchNorm


def local_voxel_offsets(num_local_voxel, max_dist):
    """Centers of the local voxel lattice in the query frame (V, 3)."""
    kx, ky, kz = num_local_voxel
    def axis(n):
        return (np.arange(n) + 0.5) / n * 2 * max_dist - max_dist
    gx, gy, gz = np.meshgrid(axis(kx), axis(ky), axis(kz), indexing="ij")
    return jnp.asarray(np.stack([gx, gy, gz], axis=-1).reshape(-1, 3), jnp.float32)


class VectorPoolAggregation(nn.Module):
    input_channels: int
    num_local_voxel: Tuple[int, int, int] = (3, 3, 3)
    local_aggregation_type: str = "local_interpolation"
    num_reduced_channels: Optional[int] = 30
    num_channels_of_local_aggregation: int = 32
    post_mlps: Sequence[int] = (128,)
    max_neighbor_distance: float = 1.0
    neighbor_nsample: int = 32
    neighbor_distance_multiplier: float = 2.0

    @nn.compact
    def __call__(self, xyz, feats, mask, new_xyz, new_mask, train=False):
        """xyz (B,N,3), feats (B,N,C), new_xyz (B,Q,3) -> (B, Q, post_mlps[-1])."""
        v_off = local_voxel_offsets(self.num_local_voxel, self.max_neighbor_distance)
        v = v_off.shape[0]
        cr = self.num_reduced_channels or self.input_channels
        if feats.shape[-1] != cr:
            feats = nn.Dense(cr, use_bias=False, name="reduce")(feats)

        nsample = self.neighbor_nsample if self.neighbor_nsample > 0 else 32
        radius = self.max_neighbor_distance * self.neighbor_distance_multiplier
        idx, empty = pn2.ball_query(radius, nsample, xyz, new_xyz,
                                    mask=mask, new_mask=new_mask)
        n_xyz = pn2.group_points(xyz, idx) - new_xyz[:, :, None, :]  # (B,Q,S,3)
        n_feat = pn2.group_points(feats, idx)  # (B,Q,S,Cr)
        slot_ok = (~empty)[:, :, None] & new_mask[:, :, None]  # (B,Q,1)->bcast

        # distances of every neighbor to every local voxel center: (B,Q,V,S)
        d = jnp.linalg.norm(n_xyz[:, :, None, :, :] - v_off[None, None, :, None, :],
                            axis=-1)
        d = jnp.where(slot_ok[:, :, None], d, 1e9)

        if self.local_aggregation_type == "local_interpolation":
            # 3-NN inverse-distance interpolation at each voxel center
            neg, nn3 = jax.lax.top_k(-d, 3)  # (B,Q,V,3)
            dist3 = jnp.maximum(-neg, 0.0)
            recip = 1.0 / (dist3 + 1e-8)
            w = recip / jnp.sum(recip, axis=-1, keepdims=True)
            f3 = jnp.take_along_axis(
                n_feat[:, :, None], nn3[..., None], axis=3)  # (B,Q,V,3,Cr)
            interp = jnp.sum(f3 * w[..., None], axis=-2)  # (B,Q,V,Cr)
            p3 = jnp.take_along_axis(
                n_xyz[:, :, None], nn3[..., None], axis=3)  # (B,Q,V,3,3)
            pos_enc = (p3 - v_off[None, None, :, None, :]).reshape(
                p3.shape[:3] + (9,))
            local = jnp.concatenate([interp, pos_enc], axis=-1)  # (B,Q,V,Cr+9)
        elif self.local_aggregation_type == "voxel_avg_pool":
            # assign each neighbor to its nearest voxel center, mean per voxel
            cell = jnp.argmin(d, axis=2)  # (B,Q,S)
            onehot = jax.nn.one_hot(cell, v, axis=2)  # (B,Q,V,S)
            onehot = onehot * slot_ok[:, :, None].astype(onehot.dtype)
            cnt = jnp.maximum(jnp.sum(onehot, axis=-1, keepdims=True), 1.0)
            meanf = jnp.einsum("bqvs,bqsc->bqvc", onehot, n_feat) / cnt
            meanp = jnp.einsum("bqvs,bqsc->bqvc", onehot, n_xyz) / cnt
            local = jnp.concatenate([meanf, meanp - v_off[None, None]], axis=-1)
        else:
            raise NotImplementedError(self.local_aggregation_type)

        # per-voxel grouped linear (the groups=V Conv1d), then flatten
        cl = self.num_channels_of_local_aggregation
        w = self.param("grouped_kernel",
                       nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                       (v, local.shape[-1], cl))
        h = jnp.einsum("bqvc,vcd->bqvd", local, w)
        h = h.reshape(h.shape[0], h.shape[1], v * cl)
        h = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name="grouped_bn")(
            h, mask=new_mask, use_running_average=not train)
        h = nn.relu(h)
        for i, c in enumerate(self.post_mlps):
            h = nn.Dense(int(c), use_bias=False, name=f"post_{i}")(h)
            h = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name=f"post_bn_{i}")(
                h, mask=new_mask, use_running_average=not train)
            h = nn.relu(h)
        return jnp.where(new_mask[..., None], h, 0.0)


class VectorPoolAggregationModuleMSG(nn.Module):
    """Multi-group VectorPool (reference :312-340): one VectorPoolAggregation
    per GROUPS_CFG entry, concatenated, shared MSG_POST_MLPS."""

    input_channels: int
    config: Any

    @nn.compact
    def __call__(self, xyz, feats, mask, new_xyz, new_mask, train=False):
        cfg = self.config
        outs = []
        g = 0
        while f"GROUP_CFG_{g}" in cfg:
            gc = cfg[f"GROUP_CFG_{g}"]
            agg = VectorPoolAggregation(
                input_channels=self.input_channels,
                num_local_voxel=tuple(gc["NUM_LOCAL_VOXEL"]),
                local_aggregation_type=cfg.get("LOCAL_AGGREGATION_TYPE",
                                               "local_interpolation"),
                num_reduced_channels=gc.get("NUM_REDUCED_CHANNELS",
                                            cfg.get("NUM_REDUCED_CHANNELS")),
                num_channels_of_local_aggregation=int(
                    cfg["NUM_CHANNELS_OF_LOCAL_AGGREGATION"]),
                post_mlps=tuple(gc["POST_MLPS"]),
                max_neighbor_distance=float(gc["MAX_NEIGHBOR_DISTANCE"]),
                neighbor_nsample=int(gc.get("NEIGHBOR_NSAMPLE", -1)),
                name=f"group_{g}")
            outs.append(agg(xyz, feats, mask, new_xyz, new_mask, train))
            g += 1
        h = jnp.concatenate(outs, axis=-1)
        for i, c in enumerate(cfg.get("MSG_POST_MLPS", [])):
            h = nn.Dense(int(c), use_bias=False, name=f"msg_post_{i}")(h)
            h = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name=f"msg_post_bn_{i}")(
                h, mask=new_mask, use_running_average=not train)
            h = nn.relu(h)
        return jnp.where(new_mask[..., None], h, 0.0)
