"""PointNet++ set-abstraction / feature-propagation modules (flax).

Behavioral counterpart of
/root/reference/pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py and
pointnet2_utils.py (QueryAndGroup :231-264, GroupAll :267-290): FPS centroid
selection, multi-scale ball-query grouping with relative-xyz concat, shared
1x1-conv MLPs (Dense over channel-last here), max/avg pooling over the
neighborhood axis, and inverse-distance 3-NN feature propagation.

TPU redesign: everything stays in one padded `(B, N, ...)` layout with
validity masks (the reference's ragged "stack" layout exists only for CUDA
kernel convenience); the shared MLPs are channel-last Dense (XLA lowers them
onto the MXU); BN uses MaskedBatchNorm so padded rows never pollute batch
statistics (torch BatchNorm2d defaults eps=1e-5, momentum=0.1).

Padding semantics beyond the reference (which only ever sees full batches):
- queries that are themselves padding produce zeroed features and False mask;
- empty balls (no valid point in radius) produce zeroed features, matching
  what downstream consumers expect from "no evidence" rather than the
  reference's garbage-gather of point 0.
"""
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import pointnet2 as pn2
from ..model_utils.norm import MaskedBatchNorm


class SharedMLP(nn.Module):
    """[Dense + (BN) + ReLU] x len(channels), channel-last.

    use_bn=False gives biased Dense + ReLU (the reference's bn=False path,
    e.g. PointRCNNHead with USE_BN: False)."""

    channels: Sequence[int]
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train=False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, name=f"dense_{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name=f"bn_{i}")(
                    x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return x


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    npoint=None means "group all" (single global descriptor per cloud).
    """

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale, WITHOUT the +3 xyz adjustment
    use_xyz: bool = True
    pool_method: str = "max_pool"
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, features, mask=None, new_xyz=None, new_mask=None, train=False):
        """xyz (B,N,3), features (B,N,C) or None, mask (B,N) bool.

        Returns (new_xyz (B,M,3), new_features (B,M,sum(mlp[-1])), new_mask).
        """
        b, n, _ = xyz.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)

        if self.npoint is not None:
            if new_xyz is None:
                fps_idx = pn2.farthest_point_sample(xyz, self.npoint, mask)
                new_xyz = pn2.gather_points(xyz, fps_idx)
                new_mask = jnp.take_along_axis(mask, fps_idx, axis=1)
            elif new_mask is None:
                new_mask = jnp.ones(new_xyz.shape[:2], bool)
        else:  # GroupAll
            new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
            new_mask = jnp.ones((b, 1), bool)

        outs = []
        for i, mlp_spec in enumerate(self.mlps):
            if self.npoint is not None:
                idx, empty = pn2.ball_query(
                    self.radii[i], self.nsamples[i], xyz, new_xyz,
                    mask=mask, new_mask=new_mask)
                grouped_xyz = pn2.group_points(xyz, idx) - new_xyz[:, :, None, :]
                parts = [grouped_xyz]
                if features is not None:
                    parts.append(pn2.group_points(features, idx))
                grouped = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
                if not self.use_xyz and features is not None:
                    grouped = grouped[..., 3:]
                slot_mask = (~empty[..., None]) & new_mask[..., None]  # (B,M,1)
                slot_mask = jnp.broadcast_to(slot_mask, grouped.shape[:3])
            else:
                parts = [xyz[:, None]]  # (B,1,N,3)
                if features is not None:
                    parts.append(features[:, None])
                grouped = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
                if not self.use_xyz and features is not None:
                    grouped = grouped[..., 3:]
                slot_mask = mask[:, None, :]  # (B,1,N)

            h = SharedMLP(mlp_spec, use_bn=self.use_bn, name=f"mlp_{i}")(grouped, mask=slot_mask, train=train)
            if self.pool_method == "max_pool":
                h = jnp.max(jnp.where(slot_mask[..., None], h, -jnp.inf), axis=2)
                h = jnp.where(jnp.isfinite(h), h, 0.0)
            elif self.pool_method == "avg_pool":
                cnt = jnp.maximum(jnp.sum(slot_mask, axis=2, keepdims=False), 1)
                h = jnp.sum(jnp.where(slot_mask[..., None], h, 0.0), axis=2) / cnt[..., None]
            else:
                raise NotImplementedError(self.pool_method)
            outs.append(h)

        new_features = jnp.concatenate(outs, axis=-1)
        new_features = jnp.where(new_mask[..., None], new_features, 0.0)
        return new_xyz, new_features, new_mask


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale convenience wrapper (reference pointnet2_modules.py:102)."""

    @classmethod
    def make(cls, mlp, npoint=None, radius=None, nsample=None, **kw):
        return cls(npoint=npoint, radii=[radius], nsamples=[nsample], mlps=[mlp], **kw)


class PointnetFPModule(nn.Module):
    """Inverse-distance-weighted 3-NN propagation + shared MLP
    (reference pointnet2_modules.py:122-177)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknow_feats, known_feats,
                 unknown_mask=None, known_mask=None, train=False):
        """unknown (B,n,3), known (B,m,3) or None, feats channel-last."""
        if known is not None:
            dist, idx = pn2.three_nn(unknown, known, known_mask=known_mask)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interp = pn2.three_interpolate(known_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]))

        h = interp if unknow_feats is None else jnp.concatenate([interp, unknow_feats], axis=-1)
        h = SharedMLP(self.mlp, name="mlp")(h, mask=unknown_mask, train=train)
        if unknown_mask is not None:
            h = jnp.where(unknown_mask[..., None], h, 0.0)
        return h
