"""Sparse 3D voxel backbones (SECOND family) in pure JAX.

Capability match for /root/reference/pcdet/models/backbones_3d/
spconv_backbone.py (VoxelBackBone8x :30-..., VoxelResBackBone8x :183-295),
built on the fixed-budget sparse-conv engine (pcp_tpu.ops.sparse3d) instead of
the external spconv CUDA library. Structure (ResBackBone):

  conv_input: subm3 C_in->16          [z 41]
  conv1: 2 x ResBlock(16)             [z 41]
  conv2: spconv3 s2 16->32 + 2 x Res  [z 21]
  conv3: spconv3 s2 32->64 + 2 x Res  [z 11]
  conv4: spconv3 s2 p(0,1,1) 64->128 + 2 x Res [z 5]
  conv_out: spconv (3,1,1) s(2,1,1) 128->128   [z 2]

Neighbor maps are built once per active set and shared by every submanifold
conv at that level (the 'indice_key' reuse of spconv). BatchNorms are masked
to valid voxels (eps 1e-3, momentum 0.01, reference norm_fn).
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import sparse3d
from ..model_utils.norm import MaskedBatchNorm


def _conv_param(module, name, k, cin, cout):
    shape = (k, cin, cout)
    fan_in = k * cin
    init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
    return module.param(name, init, (k * cin, cout)).reshape(shape)


class SparseSubMConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    use_norm: bool = True
    act: bool = True

    @nn.compact
    def __call__(self, feats, nmap, valid, train=False):
        k, cin = nmap.shape[1], feats.shape[-1]
        w = _conv_param(self, "kernel", k, cin, self.out_channels)
        x = sparse3d.subm_conv_apply(feats, nmap, w)
        if self.use_norm:
            x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
                x, mask=valid, use_running_average=not train
            )
        if self.act:
            x = nn.relu(x)
        return jnp.where(valid[..., None], x, 0.0)


class SparseBasicBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, feats, nmap, valid, train=False):
        identity = feats
        x = SparseSubMConv(self.channels, name="conv1")(feats, nmap, valid, train)
        x = SparseSubMConv(self.channels, act=False, name="conv2")(x, nmap, valid, train)
        return jnp.where(valid[..., None], nn.relu(x + identity), 0.0)


class _StridedSparseConv(nn.Module):
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1

    @nn.compact
    def __call__(self, in_ids, feats, dims, out_dims, out_ids, train=False):
        ks = self.kernel_size
        k = (
            ks[0] * ks[1] * ks[2]
            if isinstance(ks, (tuple, list))
            else ks**3
        )
        w = _conv_param(self, "kernel", k, feats.shape[-1], self.out_channels)
        x = sparse3d.strided_conv_apply(
            in_ids, feats, out_ids, dims, out_dims, ks, self.stride, self.padding, w
        )
        valid = out_ids < out_dims[0] * out_dims[1] * out_dims[2]
        x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
            x, mask=valid, use_running_average=not train
        )
        return jnp.where(valid[..., None], nn.relu(x), 0.0), valid


def _out_dims(dims, kernel, stride, padding):
    def one(n, k, s, p):
        return (n + 2 * p - k) // s + 1

    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    return tuple(one(dims[i], kernel[i], stride[i], padding[i]) for i in range(3))


class VoxelResBackBone8x(nn.Module):
    model_cfg: Any
    info: Any
    num_point_features: int
    num_res_blocks: int = 2

    num_output_features: int = 128

    @nn.compact
    def __call__(self, batch, train=False):
        ids = batch["voxel_ids"]
        feats = batch["voxel_features"]
        dims = batch["sparse_dims"]  # (nz, ny, nx)
        b, v, _ = feats.shape
        offs = sparse3d.kernel_offsets(3)

        def limit(d):
            return d[0] * d[1] * d[2]

        # ---- level 1 (subm): shared neighbor map
        nmap1 = sparse3d.neighbor_map_subm(ids, offs, dims)
        valid1 = ids < limit(dims)
        x = SparseSubMConv(16, name="conv_input")(feats, nmap1, valid1, train)
        for i in range(self.num_res_blocks):
            x = SparseBasicBlock(16, name=f"conv1_{i}")(x, nmap1, valid1, train)

        # per-level sparse tensors for downstream PFE consumers (the
        # reference's batch_dict['multi_scale_3d_features'], x_conv1..x_conv4)
        multi_scale = {"x_conv1": (ids, x, dims, 1)}
        stage_cfgs = [
            ("conv2", 32, 3, 2, 1, 2),
            ("conv3", 64, 3, 2, 1, 4),
            ("conv4", 128, 3, 2, (0, 1, 1), 8),
        ]
        cur_ids, cur_dims = ids, dims
        for name, ch, ksz, st, pad, ds in stage_cfgs:
            out_dims = _out_dims(cur_dims, ksz, st, pad)
            out_ids = sparse3d.strided_output_ids(
                cur_ids, cur_dims, out_dims, ksz, st, pad, budget=v
            )
            x, valid = _StridedSparseConv(ch, ksz, st, pad, name=f"{name}_down")(
                cur_ids, x, cur_dims, out_dims, out_ids, train
            )
            nmap = sparse3d.neighbor_map_subm(out_ids, offs, out_dims)
            for i in range(self.num_res_blocks):
                x = SparseBasicBlock(ch, name=f"{name}_{i}")(x, nmap, valid, train)
            cur_ids, cur_dims = out_ids, out_dims
            multi_scale[f"x_{name}"] = (cur_ids, x, cur_dims, ds)

        # conv_out: z-only stride
        out_dims = _out_dims(cur_dims, (3, 1, 1), (2, 1, 1), 0)
        out_ids = sparse3d.strided_output_ids(
            cur_ids, cur_dims, out_dims, (3, 1, 1), (2, 1, 1), 0, budget=v
        )
        x, valid = _StridedSparseConv(128, (3, 1, 1), (2, 1, 1), 0, name="conv_out")(
            cur_ids, x, cur_dims, out_dims, out_ids, train
        )

        out = dict(batch)
        out["encoded_spconv_tensor"] = (out_ids, x)
        out["encoded_spconv_dims"] = out_dims
        out["multi_scale_3d_features"] = multi_scale
        return out


# Non-residual variant (reference spconv_backbone.py:30-…) shares the same
# topology; the V2X second configs use only the residual flavor, so it is an
# alias here (plain-conv blocks land if a config ever needs exact VoxelBackBone8x).
VoxelBackBone8x = VoxelResBackBone8x


class _InverseSparseConv(nn.Module):
    """Transposed strided conv back onto the paired fine active set
    (spconv 'inverseconv' with shared indice_key)."""

    out_channels: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1

    @nn.compact
    def __call__(self, coarse_ids, feats, fine_ids, fine_dims, coarse_dims, train=False):
        ks = self.kernel_size
        k = ks[0] * ks[1] * ks[2] if isinstance(ks, (tuple, list)) else ks ** 3
        w = _conv_param(self, "kernel", k, feats.shape[-1], self.out_channels)
        x = sparse3d.inverse_conv_apply(
            coarse_ids, feats, fine_ids, fine_dims, coarse_dims,
            ks, self.stride, self.padding, w)
        valid = fine_ids < fine_dims[0] * fine_dims[1] * fine_dims[2]
        x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
            x, mask=valid, use_running_average=not train)
        return jnp.where(valid[..., None], nn.relu(x), 0.0)


class UNetV2(nn.Module):
    """Sparse encoder-decoder (Part-A2's backbone).

    Behavioral counterpart of
    /root/reference/pcdet/models/backbones_3d/spconv_unet.py:49-212: the
    VoxelBackBone8x encoder (16/32/64/64 + conv_out 128) plus UR decoder
    blocks — lateral SparseBasicBlock, bottom|lateral concat through a subm
    merge conv, grouped-sum channel reduction residual, inverse conv up one
    level — emitting per-voxel 16-wide point features at full resolution.
    """

    model_cfg: Any
    info: Any
    num_point_features: int

    @nn.compact
    def __call__(self, batch, train=False):
        ids = batch["voxel_ids"]
        feats = batch["voxel_features"]
        dims = batch["sparse_dims"]
        b, v, _ = feats.shape
        offs = sparse3d.kernel_offsets(3)

        def limit(d):
            return d[0] * d[1] * d[2]

        # ---------------- encoder (reference conv_input..conv4)
        nmap1 = sparse3d.neighbor_map_subm(ids, offs, dims)
        valid1 = ids < limit(dims)
        x = SparseSubMConv(16, name="conv_input")(feats, nmap1, valid1, train)
        x1 = SparseSubMConv(16, name="conv1_0")(x, nmap1, valid1, train)

        levels = {1: (ids, x1, dims, nmap1, valid1)}
        stage_cfgs = [
            (2, 32, 3, 2, 1),
            (3, 64, 3, 2, 1),
            (4, 64, 3, 2, (0, 1, 1)),
        ]
        cur_ids, cur_dims, cur_x = ids, dims, x1
        for lvl, ch, ksz, st, pad in stage_cfgs:
            out_dims = _out_dims(cur_dims, ksz, st, pad)
            out_ids = sparse3d.strided_output_ids(
                cur_ids, cur_dims, out_dims, ksz, st, pad, budget=v)
            cur_x, valid = _StridedSparseConv(ch, ksz, st, pad, name=f"conv{lvl}_down")(
                cur_ids, cur_x, cur_dims, out_dims, out_ids, train)
            nmap = sparse3d.neighbor_map_subm(out_ids, offs, out_dims)
            for i in range(2):
                cur_x = SparseSubMConv(ch, name=f"conv{lvl}_{i}")(cur_x, nmap, valid, train)
            cur_ids, cur_dims = out_ids, out_dims
            levels[lvl] = (cur_ids, cur_x, cur_dims, nmap, valid)

        out = dict(batch)
        if self.model_cfg.get("RETURN_ENCODED_TENSOR", True):
            od = _out_dims(cur_dims, (3, 1, 1), (2, 1, 1), 0)
            oids = sparse3d.strided_output_ids(
                cur_ids, cur_dims, od, (3, 1, 1), (2, 1, 1), 0, budget=v)
            xo, _ = _StridedSparseConv(128, (3, 1, 1), (2, 1, 1), 0, name="conv_out")(
                cur_ids, cur_x, cur_dims, od, oids, train)
            out["encoded_spconv_tensor"] = (oids, xo)
            out["encoded_spconv_dims"] = od
            out["multi_scale_3d_features"] = {
                f"x_conv{l}": (levels[l][0], levels[l][1], levels[l][2],
                               (1, 2, 4, 8)[l - 1]) for l in (1, 2, 3, 4)
            }

        # ---------------- decoder (UR blocks, reference :135-144; the
        # grouped-sum channel_reduction residual is :146-160)
        def ur(lvl, bottom, ch_m, inv_out, fine_lvl, inv_pad, name):
            l_ids, l_x, l_dims, l_nmap, l_valid = levels[lvl]
            x_trans = SparseBasicBlock(l_x.shape[-1], name=f"{name}_t")(
                l_x, l_nmap, l_valid, train)
            cat = jnp.concatenate([bottom, x_trans], axis=-1)
            x_m = SparseSubMConv(ch_m, name=f"{name}_m")(cat, l_nmap, l_valid, train)
            red = cat.reshape(cat.shape[0], cat.shape[1], ch_m, -1).sum(-1)
            merged = x_m + red
            if fine_lvl is None:
                return SparseSubMConv(ch_m, name=f"{name}_out")(
                    merged, l_nmap, l_valid, train)
            f_ids, _, f_dims, _, _ = levels[fine_lvl]
            return _InverseSparseConv(inv_out, 3, 2, inv_pad, name=f"{name}_inv")(
                l_ids, merged, f_ids, f_dims, l_dims, train)

        x_up4 = ur(4, levels[4][1], 64, 64, 3, (0, 1, 1), "up4")   # lvl4 -> lvl3
        x_up3 = ur(3, x_up4, 64, 32, 2, 1, "up3")                  # lvl3 -> lvl2
        x_up2 = ur(2, x_up3, 32, 16, 1, 1, "up2")                  # lvl2 -> lvl1
        x_up1 = ur(1, x_up2, 16, 16, None, 1, "up1")               # lvl1 (conv5)

        nzp, nyd, nxd = dims
        vs = jnp.asarray(self.info.voxel_size, jnp.float32)
        mins = jnp.asarray(self.info.point_cloud_range[0:3], jnp.float32)
        zz, yy, xx = sparse3d.decode_ids(jnp.minimum(ids, limit(dims) - 1), dims)
        centers = (jnp.stack([xx, yy, zz], axis=-1).astype(jnp.float32) + 0.5) * vs + mins
        out["point_features"] = x_up1  # (B, V, 16)
        out["point_coords"] = centers
        out["point_coords_mask"] = valid1
        return out
