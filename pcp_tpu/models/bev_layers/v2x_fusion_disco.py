"""DiscoNet mid fusion: compress, warp per-agent BEVs into the ego frame,
learned per-pixel edge weights, softmax-weighted sum, decompress (+ KD loss
against the early-fusion teacher BEV).

Capability match for /root/reference/pcdet/models/bev_layers/v2x_fusion_disco.py.
The SE(2) BEV warp reproduces torch's ``affine_grid``/``grid_sample`` (nearest,
align_corners=False) coordinate convention exactly (:29-45): normalized output
coords are mapped through theta = [R^T | -R^T t_norm] and nearest-sampled.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def transform_bev_img(dst_se3_src, bev_in_src, pc_range_min, pix_size):
    """Warp a source-frame BEV image into the destination frame.

    Args:
        dst_se3_src: (4, 4); bev_in_src: (H, W, C).
    Returns (H, W, C).
    """
    h, w, c = bev_in_src.shape
    rot = dst_se3_src[:2, :2]
    t = dst_se3_src[:2, 3]
    t_norm = 2.0 * ((t - pc_range_min) / pix_size) / h - 1.0

    # output pixel-center normalized coords (align_corners=False)
    xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    p = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)

    src = jnp.einsum("ij,hwj->hwi", rot.T, p - t_norm[None, None, :])  # (H, W, 2)

    # nearest sampling, align_corners=False: ix = round(((x+1)*W - 1)/2)
    ix = jnp.round(((src[..., 0] + 1.0) * w - 1.0) / 2.0).astype(jnp.int32)
    iy = jnp.round(((src[..., 1] + 1.0) * h - 1.0) / 2.0).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    sampled = bev_in_src[iy, ix]  # (H, W, C)
    return jnp.where(valid[..., None], sampled, 0.0)


class PixelWeightedFusionSoftmax(nn.Module):
    """1x1-conv MLP scoring each (ego, agent) BEV pair per pixel
    (v2x_fusion_disco.py:8-26)."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (1, 1), name="conv1_1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1_1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (1, 1), name="conv1_2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1_2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="conv1_4")(x)
        return nn.relu(x)


class _CompressBlock(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.mid, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, name="conv1")(x)
        return x


class V2XMidFusionDisco(nn.Module):
    model_cfg: Any
    info: Any
    num_bev_features: int

    def setup(self):
        ch = int(self.model_cfg["COMPRESSED_CHANNELS"])
        self.compressor = _CompressBlock(ch, ch, name="compressor")
        self.pixel_weightor = PixelWeightedFusionSoftmax(name="pixel_weightor")
        self.decompressor = _CompressBlock(self.num_bev_features, self.num_bev_features, name="decompressor")
        self.pc_min = float(self.model_cfg.get("PC_RANGE_MIN", self.info.point_cloud_range[0]))
        stride = 4  # final BEV stride of the pillar backbone
        self.pix_size = float(
            self.model_cfg.get("FINAL_BEV_PIXEL_SIZE", self.info.voxel_size[0] * stride)
        )

    def __call__(self, batch, train=False):
        out = dict(batch)
        ego_bev = self.compressor(batch["spatial_features_2d"], train=train)  # (B, H, W, ch)
        b = ego_bev.shape[0]

        all_bev = [ego_bev]
        all_w = [
            self.pixel_weightor(jnp.concatenate([ego_bev, ego_bev], axis=-1), train=train)
        ]

        se3_from_ego = batch.get("se3_from_ego_arr")  # (B, 6, 4, 4)
        agent_present = batch.get("agent_present")  # (B, 6) bool

        for agent_idx in sorted(batch.get("bev_img", {}).keys()):
            bev = self.compressor(batch["bev_img"][agent_idx], train=train)
            ego_se3_agent = jnp.linalg.inv(se3_from_ego[:, agent_idx])  # (B, 4, 4)
            warped = jax.vmap(
                lambda tf, img: transform_bev_img(tf, img, self.pc_min, self.pix_size)
            )(ego_se3_agent, bev)
            if agent_present is not None:
                warped = jnp.where(agent_present[:, agent_idx, None, None, None], warped, 0.0)
            w = self.pixel_weightor(jnp.concatenate([ego_bev, warped], axis=-1), train=train)
            all_bev.append(warped)
            all_w.append(w)

        weights = jax.nn.softmax(jnp.concatenate(all_w, axis=-1), axis=-1)  # (B, H, W, A)
        stacked = jnp.stack(all_bev, axis=-1)  # (B, H, W, ch, A)
        fused = jnp.sum(stacked * weights[:, :, :, None, :], axis=-1)
        fused = self.decompressor(fused, train=train)

        if train and "bev_img_early" in batch:
            p = jax.nn.softmax(fused, axis=-1)
            q = jax.nn.softmax(batch["bev_img_early"], axis=-1)
            diff = p - q
            sm_l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
            out["distill_loss"] = jnp.mean(sm_l1) * 10.0

        out["spatial_features_2d"] = fused
        return out
