"""Focal sparse convolution (Focals Conv, CVPR'22) — TPU-native.

Behavioral counterpart of
/root/reference/pcdet/models/backbones_3d/focal_sparse_conv/focal_sparse_conv.py
and spconv_backbone_focal.py (lidar path; USE_IMG  multimodal fusion fails
loudly — it needs camera calibrations absent from every shipped config):

  * a SubMConv predicts K^3 importance logits per active voxel: the last
    channel is the voxel's own (center) importance, the rest gate its K^3-1
    kernel-offset neighbors (:40-46, :199-224);
  * foreground voxels (center importance above THRESHOLD, or the TOPK
    fraction) spawn zero-feature voxels at the gated offsets — the active set
    *grows* where the network predicts objects (split_voxels,
    focal_sparse_utils.py:90-147);
  * the union set (dedup'd) runs through the main SubMConv + BN + ReLU;
  * training supervises the center importance with a softmax focal loss
    against voxel-center-inside-any-GT-box (:129-170).

Fixed-shape re-design: the reference's per-sample torch.cat/unique growth
becomes a budgeted ``compact_unique`` over (V + V*(K^3-1)) candidate ids —
the active buffer grows by GROWTH_FACTOR*V slots and overflow drops lowest
(spatially-last) candidates. The reference's mask_kernel rescaling of
duplicate-merged voxels (check_repeat averaging) is not applied: spawned
voxels carry zero features, so in the reference that scale only affected
originals merged with a spawned duplicate (skip_mask_kernel semantics).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sparse3d
from ...ops.points_in_boxes import points_in_boxes


def softmax_focal_loss(mask_voxel, target, valid, gamma=2.0, eps=1e-7):
    """Reference FocalLoss (focal_sparse_utils.py:7-36): 2-class softmax CE
    with a (1-p)^gamma modulation, mean over (valid) voxels."""
    logit = jnp.stack([1.0 - mask_voxel, mask_voxel], axis=-1)
    logit = jnp.clip(logit, eps, 1.0 - eps)
    y = jax.nn.one_hot(target.astype(jnp.int32), 2, dtype=logit.dtype)
    loss = -y * jnp.log(logit) * (1.0 - logit) ** gamma
    w = valid[..., None].astype(logit.dtype)
    return jnp.sum(loss * w) / jnp.clip(jnp.sum(w) * 2, 1.0)


class FocalSparseConv(nn.Module):
    """One focal layer: importance prediction + set growth + SubM conv."""

    in_channels: int
    out_channels: int
    voxel_stride: int
    threshold: float = 0.5
    topk: bool = False
    mask_multi: bool = False
    kernel_size: int = 3
    growth_factor: float = 0.5  # spawn budget as a fraction of V

    @nn.compact
    def __call__(self, ids, feats, dims, batch, train=False):
        k3 = self.kernel_size ** 3
        offs = sparse3d.kernel_offsets(self.kernel_size)
        center_row = k3 // 2
        noncenter = np.concatenate(
            [np.arange(center_row), np.arange(center_row + 1, k3)])
        nz, ny, nx = (int(d) for d in dims)
        limit = nz * ny * nx
        b, v = ids.shape

        nmap = sparse3d.neighbor_map_subm(ids, offs, dims)
        w_imp = self.param(
            "conv_imp", nn.initializers.lecun_normal(),
            (k3, self.in_channels, k3))
        imps = sparse3d.subm_conv_apply(feats, nmap, w_imp)  # (B, V, K^3)
        valid = ids < limit
        mask_voxel = jax.nn.sigmoid(imps[..., -1])
        mask_kernel = jax.nn.sigmoid(imps[..., :-1])  # gates for K^3-1 offsets

        if self.topk:
            count = int(v * self.threshold)
            rank = jnp.argsort(jnp.argsort(
                -jnp.where(valid, mask_voxel, -jnp.inf), axis=1), axis=1)
            fore = (rank < count) & valid
        else:
            fore = (mask_voxel > self.threshold) & valid

        if self.mask_multi:
            feats = feats * jnp.where(valid, mask_voxel, 1.0)[..., None]

        # spawn candidates at gated kernel offsets of foreground voxels
        z, y, x = sparse3d.decode_ids(jnp.minimum(ids, limit - 1), dims)
        off_j = jnp.asarray(offs[noncenter])  # (K^3-1, 3)
        qz = z[:, :, None] + off_j[None, None, :, 0]
        qy = y[:, :, None] + off_j[None, None, :, 1]
        qx = x[:, :, None] + off_j[None, None, :, 2]
        in_bounds = ((qz >= 0) & (qz < nz) & (qy >= 0) & (qy < ny)
                     & (qx >= 0) & (qx < nx))
        gated = mask_kernel >= self.threshold  # (B, V, K^3-1)
        sel = fore[:, :, None] & gated & in_bounds
        cand = jnp.where(sel, sparse3d.encode_ids(qz, qy, qx, dims), limit)

        # originals always survive: only NEW candidate ids compete for the
        # growth budget (overflow drops spatially-last candidates)
        growth = int(v * self.growth_factor)
        flat_cand = cand.reshape(b, -1)
        pos_c = sparse3d.build_gather_map(ids, flat_cand, limit)
        flat_cand = jnp.where(pos_c < 0, flat_cand, limit)  # already active
        new_ids = sparse3d.compact_unique(flat_cand, growth, limit)
        union = jnp.sort(jnp.concatenate([ids, new_ids], axis=1), axis=1)
        pos = sparse3d.build_gather_map(ids, union, limit)
        union_feats = jnp.where(
            (pos >= 0)[..., None],
            jnp.take_along_axis(feats, jnp.clip(pos, 0)[..., None], axis=1), 0.0)

        nmap_u = sparse3d.neighbor_map_subm(union, offs, dims)
        w_main = self.param(
            "conv_main", nn.initializers.lecun_normal(),
            (k3, self.in_channels, self.out_channels))
        out = sparse3d.subm_conv_apply(union_feats, nmap_u, w_main)
        valid_u = union < limit
        from ..model_utils.norm import MaskedBatchNorm

        vb2 = union.shape[1]
        out = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="bn")(
            out.reshape(b * vb2, -1), mask=valid_u.reshape(-1),
            use_running_average=not train).reshape(b, vb2, -1)
        out = nn.relu(out)

        loss = jnp.zeros(())
        if train and "gt_boxes" in batch:
            vsz = jnp.asarray(batch["voxel_size"], jnp.float32)  # (vx, vy, vz)
            rng0 = jnp.asarray(batch["pc_range"], jnp.float32)
            centers = jnp.stack([
                (x.astype(jnp.float32) + 0.5) * self.voxel_stride * vsz[0] + rng0[0],
                (y.astype(jnp.float32) + 0.5) * self.voxel_stride * vsz[1] + rng0[1],
                (z.astype(jnp.float32) + 0.5) * self.voxel_stride * vsz[2] + rng0[2],
            ], axis=-1)  # (B, V, 3)
            gt = batch["gt_boxes"][..., :7]

            def one(c, g):
                idx = points_in_boxes(c, g)
                return idx >= 0

            target = jax.vmap(one)(centers, gt)
            loss = softmax_focal_loss(mask_voxel, target, valid)

        return union, out, loss


class VoxelBackBone8xFocal(nn.Module):
    """VoxelBackBone8x with focal layers after stages 1-3 (reference
    spconv_backbone_focal.py:111-250, lidar-only)."""

    model_cfg: Any
    info: Any
    num_point_features: int

    @nn.compact
    def __call__(self, batch, train=False):
        from .spconv_backbone import (SparseSubMConv, SparseBasicBlock,
                                      _StridedSparseConv, _out_dims)

        cfg = self.model_cfg
        if bool(cfg.get("USE_IMG", False)):
            raise NotImplementedError(
                "USE_IMG multimodal focal conv needs camera calibrations; "
                "no shipped config provides them")
        thr = float(cfg.get("FOCAL_THRESHOLD", 0.5))
        topk = bool(cfg.get("TOPK", False))
        mask_multi = bool(cfg.get("MASK_MULTI", False))

        ids = batch["voxel_ids"]
        feats = batch["voxel_features"]
        dims = batch["sparse_dims"]
        b, v, _ = feats.shape
        offs = sparse3d.kernel_offsets(3)

        def limit(d):
            return d[0] * d[1] * d[2]

        fbatch = {
            "gt_boxes": batch.get("gt_boxes"),
            "voxel_size": self.info.voxel_size,
            "pc_range": self.info.point_cloud_range,
        }

        nmap1 = sparse3d.neighbor_map_subm(ids, offs, dims)
        valid1 = ids < limit(dims)
        x = SparseSubMConv(16, name="conv_input")(feats, nmap1, valid1, train)
        x = SparseBasicBlock(16, name="conv1_0")(x, nmap1, valid1, train)
        ids, x, loss1 = FocalSparseConv(
            16, 16, voxel_stride=1, threshold=thr, topk=topk,
            mask_multi=mask_multi, name="focal1")(ids, x, dims, fbatch, train)

        total_loss = loss1
        cur_ids, cur_dims = ids, dims
        multi_scale = {"x_conv1": (cur_ids, x, cur_dims, 1)}
        stage_cfgs = [
            ("conv2", 32, 3, 2, 1, 2, True),
            ("conv3", 64, 3, 2, 1, 4, True),
            ("conv4", 64, 3, 2, (0, 1, 1), 8, False),
        ]
        for name, ch, ksz, st, pad, ds, focal in stage_cfgs:
            out_dims = _out_dims(cur_dims, ksz, st, pad)
            vb = cur_ids.shape[1]
            out_ids = sparse3d.strided_output_ids(
                cur_ids, cur_dims, out_dims, ksz, st, pad, budget=vb)
            x, valid = _StridedSparseConv(ch, ksz, st, pad, name=f"{name}_down")(
                cur_ids, x, cur_dims, out_dims, out_ids, train)
            nmap = sparse3d.neighbor_map_subm(out_ids, offs, out_dims)
            for i in range(2):
                x = SparseBasicBlock(ch, name=f"{name}_{i}")(x, nmap, valid, train)
            cur_ids, cur_dims = out_ids, out_dims
            if focal:
                cur_ids, x, l = FocalSparseConv(
                    ch, ch, voxel_stride=ds, threshold=thr, topk=topk,
                    mask_multi=mask_multi, name=f"focal_{name}")(
                        cur_ids, x, cur_dims, fbatch, train)
                total_loss = total_loss + l
            multi_scale[f"x_{name}"] = (cur_ids, x, cur_dims, ds)

        out_dims = _out_dims(cur_dims, (3, 1, 1), (2, 1, 1), 0)
        out_ids = sparse3d.strided_output_ids(
            cur_ids, cur_dims, out_dims, (3, 1, 1), (2, 1, 1), 0,
            budget=cur_ids.shape[1])
        x, valid = _StridedSparseConv(128, (3, 1, 1), (2, 1, 1), 0, name="conv_out")(
            cur_ids, x, cur_dims, out_dims, out_ids, train)

        out = dict(batch)
        out["encoded_spconv_tensor"] = (out_ids, x)
        out["encoded_spconv_dims"] = out_dims
        out["multi_scale_3d_features"] = multi_scale
        if train:
            out["backbone_3d_loss"] = total_loss
            out["backbone_3d_tb"] = {"loss_box_of_pts": total_loss}
        return out
