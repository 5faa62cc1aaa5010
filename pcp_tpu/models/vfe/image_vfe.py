"""ImageVFE — CaDDN's camera voxel feature encoder (frustum features from
depth-classified image features, sampled into the lidar voxel grid).

Behavioral counterpart of
/root/reference/pcdet/models/backbones_3d/vfe/image_vfe.py and its
image_vfe_modules (ffn/depth_ffn.py, ffn/ddn/ddn_template.py,
f2v/frustum_grid_generator.py, f2v/sampler.py, ffn/ddn_loss/*): pixel-wise
depth classification, plane-sweep frustum volume (depth_probs x features),
voxel-grid -> image-frustum coordinate transform with UD/LID/SID depth
discretization, trilinear sampling, and the focal + fg/bg-balanced depth
loss.

Deviation (documented): the reference's DDN is a torchvision DeepLabV3-
ResNet101 with ImageNet weights; no torchvision exists here, so the DDN is a
compact flax conv encoder with the same contract (features + D+1 depth
logits at 1/downsample resolution). Everything downstream — FFN math, F2V
geometry, loss — follows the reference exactly; layouts are NHWC/channel-
last (images (B, H, W, 3), frustum (B, D, H', W', C), voxels
(B, Z, Y, X, C) feeding Conv2DCollapse).
"""
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bin_depths(depth_map, mode, depth_min, depth_max, num_bins, target=False):
    """transform_utils.bin_depths (reference :57-95)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.maximum(1 + 8 * (depth_map - depth_min) / bin_size, 0.0))
    elif mode == "SID":
        indices = num_bins * (jnp.log(1 + depth_map) - math.log(1 + depth_min)) / (
            math.log(1 + depth_max) - math.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        oob = (indices < 0) | (indices > num_bins) | (~jnp.isfinite(indices))
        indices = jnp.where(oob, num_bins, indices)  # overflow bin
        indices = jnp.floor(indices).astype(jnp.int32)
    return indices


class DDNLite(nn.Module):
    """Compact conv encoder standing in for the DeepLabV3 DDN (ddn_template)."""

    num_filters: int = 64
    num_depth_bins: int = 80
    downsample_factor: int = 4

    @nn.compact
    def __call__(self, images, train=False):
        x = images
        n_down = int(np.log2(self.downsample_factor))
        for i in range(n_down):
            x = nn.Conv(self.num_filters, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, name=f"down_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"down_bn_{i}")(x)
            x = nn.relu(x)
        for i in range(2):
            h = nn.Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                        name=f"block_{i}")(x)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"block_bn_{i}")(h)
            x = nn.relu(x + h)
        feats = x
        logits = nn.Conv(self.num_depth_bins + 1, (1, 1), name="depth_head")(x)
        return feats, logits


def trilinear_sample_frustum(frustum, grid_norm):
    """frustum (B, D, H, W, C); grid_norm (B, X, Y, Z, 3) normalized (u, v, d)
    in [-1, 1] (align_corners=True); OOB -> 0 (grid_sample zeros padding)."""
    b, dd, hh, ww, c = frustum.shape

    def pix(coord, size):
        return (coord + 1.0) * 0.5 * (size - 1)

    u = pix(grid_norm[..., 0], ww)
    v = pix(grid_norm[..., 1], hh)
    d = pix(grid_norm[..., 2], dd)

    def corner(di, vi, ui, w):
        inb = ((ui >= 0) & (ui < ww) & (vi >= 0) & (vi < hh)
               & (di >= 0) & (di < dd))
        flat = frustum.reshape(b, dd * hh * ww, c)
        idx = (jnp.clip(di, 0, dd - 1) * hh + jnp.clip(vi, 0, hh - 1)) * ww \
            + jnp.clip(ui, 0, ww - 1)
        g, x_, y_, z_ = idx.shape
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1)[..., None], axis=1)
        vals = vals.reshape(g, x_, y_, z_, c)
        return vals * (w * inb)[..., None]

    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    d0 = jnp.floor(d).astype(jnp.int32)
    fu, fv, fd = u - u0, v - v0, d - d0
    out = 0.0
    for du in (0, 1):
        for dv in (0, 1):
            for ddp in (0, 1):
                w = ((fu if du else 1 - fu) * (fv if dv else 1 - fv)
                     * (fd if ddp else 1 - fd))
                out = out + corner(d0 + ddp, v0 + dv, u0 + du, w)
    return out  # (B, X, Y, Z, C)


class ImageVFE(nn.Module):
    model_cfg: Any
    num_point_features: int = 3
    voxel_size: Sequence[float] = (0.32, 0.32, 0.8)
    grid_size: Sequence[int] = (280, 250, 10)
    point_cloud_range: Sequence[float] = (2, -30.08, -3.0, 46.8, 30.08, 1.0)

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        cfg = self.model_cfg
        ffn_cfg = cfg["FFN"]
        # discretization config lives under FFN.DDN.ARGS in pcdet configs
        args = ffn_cfg["DDN"]["ARGS"]
        disc = {"mode": args["disc_cfg"]["mode"],
                "depth_min": float(args["disc_cfg"]["depth_min"]),
                "depth_max": float(args["disc_cfg"]["depth_max"]),
                "num_bins": int(args["disc_cfg"]["num_bins"])}
        ds = int(cfg.get("DOWNSAMPLE_FACTOR", 4))

        images = out["images"]  # (B, H, W, 3)
        feats, depth_logits = DDNLite(
            num_filters=int(ffn_cfg.get("CHANNEL_REDUCE", {}).get("in_channels", 64)),
            num_depth_bins=disc["num_bins"], downsample_factor=ds,
            name="ddn")(images, train=train)
        cr = ffn_cfg.get("CHANNEL_REDUCE")
        if cr is not None:
            feats = nn.Conv(int(cr["out_channels"]), (1, 1), use_bias=False,
                            name="channel_reduce")(feats)
            feats = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="channel_reduce_bn")(feats)
            feats = nn.relu(feats)

        # plane-sweep frustum volume (depth_ffn.create_frustum_features :118-141)
        probs = jax.nn.softmax(depth_logits, axis=-1)[..., :-1]  # drop >max bin
        # (B, H', W', D) x (B, H', W', C) -> (B, D, H', W', C)
        frustum = probs[..., None] * feats[..., None, :]
        frustum = jnp.transpose(frustum, (0, 3, 1, 2, 4))

        # frustum grid (f2v/frustum_grid_generator.py): voxel centers -> image
        gx, gy, gz = (int(v) for v in self.grid_size)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        mins = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        xs = (jnp.arange(gx) + 0.5) * vs[0] + mins[0]
        ys = (jnp.arange(gy) + 0.5) * vs[1] + mins[1]
        zs = (jnp.arange(gz) + 0.5) * vs[2] + mins[2]
        vx, vy, vz = jnp.meshgrid(xs, ys, zs, indexing="ij")  # (X, Y, Z)
        lidar_pts = jnp.stack([vx, vy, vz, jnp.ones_like(vx)], axis=-1)  # (X,Y,Z,4)

        l2c = out["trans_lidar_to_cam"]  # (B, 4, 4)
        c2i = out["trans_cam_to_img"]  # (B, 3, 4)
        cam = jnp.einsum("bij,xyzj->bxyzi", l2c, lidar_pts)
        img = jnp.einsum("bij,bxyzj->bxyzi", c2i, cam)
        depth = img[..., 2]
        uv = img[..., :2] / jnp.where(jnp.abs(depth[..., None]) > 1e-6,
                                      depth[..., None], 1e-6)
        dbin = bin_depths(depth, **disc)

        img_h, img_w = images.shape[1], images.shape[2]
        norm = jnp.stack([
            2 * uv[..., 0] / (img_w - 1) - 1,
            2 * uv[..., 1] / (img_h - 1) - 1,
            2 * dbin / (disc["num_bins"] - 1) - 1,
        ], axis=-1)
        norm = jnp.where(jnp.isfinite(norm) & (depth[..., None] > 0), norm, -2.0)

        voxels = trilinear_sample_frustum(frustum, norm)  # (B, X, Y, Z, C)
        out["voxel_features_dense"] = jnp.transpose(voxels, (0, 3, 2, 1, 4))  # (B,Z,Y,X,C)
        out["frustum_features"] = frustum
        out["depth_logits"] = depth_logits

        if train and "depth_maps" in out:
            out["vfe_loss"], out["vfe_tb"] = self.ddn_loss(
                depth_logits, out["depth_maps"], out.get("gt_boxes2d"), disc, ds,
                ffn_cfg["LOSS"]["ARGS"])
        return out

    @staticmethod
    def ddn_loss(depth_logits, depth_maps, gt_boxes2d, disc, downsample, loss_args):
        """Focal depth-bin CE + fg/bg balancer (ddn_loss.py + balancer.py)."""
        target = bin_depths(depth_maps, **disc, target=True)  # (B, H, W)
        # downsample target to the logits resolution (nearest)
        target = target[:, ::downsample, ::downsample]
        b, h, w, dplus = depth_logits.shape
        target = target[:, :h, :w]
        logp = jax.nn.log_softmax(depth_logits, axis=-1)
        onehot = jax.nn.one_hot(target, dplus)
        pt = jnp.sum(jnp.exp(logp) * onehot, axis=-1)
        ce = -jnp.sum(logp * onehot, axis=-1)
        alpha = float(loss_args.get("alpha", 0.25))
        gamma = float(loss_args.get("gamma", 2.0))
        focal = alpha * (1 - pt) ** gamma * ce  # (B, H, W)

        fg_mask = jnp.zeros((b, h, w), bool)
        if gt_boxes2d is not None:
            boxes = gt_boxes2d / downsample  # (B, N, 4) x1 y1 x2 y2
            uu = jnp.arange(w)[None, None, :, None]
            vv = jnp.arange(h)[None, :, None, None]
            inside = ((uu >= boxes[:, None, None, :, 0]) & (uu <= boxes[:, None, None, :, 2])
                      & (vv >= boxes[:, None, None, :, 1]) & (vv <= boxes[:, None, None, :, 3])
                      & jnp.any(boxes != 0, axis=-1)[:, None, None, :])
            fg_mask = jnp.any(inside, axis=-1)
        fg_w = float(loss_args.get("fg_weight", 13))
        bg_w = float(loss_args.get("bg_weight", 1))
        weights = jnp.where(fg_mask, fg_w, bg_w)
        num_pixels = float(h * w)
        loss = jnp.sum(focal * weights) / (num_pixels * b)
        loss = loss * float(loss_args.get("weight", 3.0))
        return loss, {"ddn_loss": loss}
