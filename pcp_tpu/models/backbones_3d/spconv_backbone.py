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
