"""HunterJr support ops, TPU-native.

Counterpart of /root/reference/pcdet/models/bev_layers/hunter_toolbox.py:
bilinear BEV sampling (:8-39, :94-127), quat->rotmat with the reference's
unnormalized [x, y, z, w] convention (:42-62), mean-scatter back to BEV
(:65-91), MLP factory (:130-158), and hard-mined regression loss (:180-219)
re-expressed with static shapes (dynamic top-k counts become rank masks over a
full sort).
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..model_utils.norm import MaskedBatchNorm


def bilinear_interpolate_bev(bev_img, points_xy, pc_range, pixel_size):
    """Sample per-point features from a BEV image, batched.

    Args:
        bev_img: (B, H, W, C); points_xy: (B, N, 2) metric xy;
        pc_range: (6,); pixel_size: (2,) = voxel_size * stride.
    Returns:
        feats (B, N, C), bev_coord (B, N, 2) float pixel coords (x, y).
    """
    h, w = bev_img.shape[1], bev_img.shape[2]
    coord = (points_xy - jnp.asarray(pc_range[:2])) / jnp.asarray(pixel_size)
    x, y = coord[..., 0], coord[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    def gather(yy, xx):
        flat = bev_img.reshape(bev_img.shape[0], h * w, -1)
        idx = yy * w + xx
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    ia, ib = gather(y0, x0), gather(y1, x0)
    ic, id_ = gather(y0, x1), gather(y1, x1)
    x0f, x1f = x0.astype(x.dtype), x1.astype(x.dtype)
    y0f, y1f = y0.astype(y.dtype), y1.astype(y.dtype)
    wa = ((x1f - x) * (y1f - y))[..., None]
    wb = ((x1f - x) * (y - y0f))[..., None]
    wc = ((x - x0f) * (y1f - y))[..., None]
    wd = ((x - x0f) * (y - y0f))[..., None]
    return ia * wa + ib * wb + ic * wc + id_ * wd, coord


def quat2mat(quat):
    """Unnormalized [x, y, z, w] quaternion -> (.., 3, 3) — the reference does
    NOT normalize (hunter_toolbox.py:42-62); preserved for training parity."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rows.reshape(quat.shape[:-1] + (3, 3))


def bev_scatter(bev_coord, feats, valid, h, w):
    """Mean-scatter point features into a dense BEV image.

    Args:
        bev_coord: (B, N, 2) float pixel coords (x, y);
        feats: (B, N, C); valid: (B, N) bool.
    Returns:
        (B, H, W, C).
    The reference keeps only strictly-interior coords (> 0, hunter_toolbox
    :78-80); preserved.
    """
    b, n, c = feats.shape
    x, y = bev_coord[..., 0], bev_coord[..., 1]
    ok = valid & (x > 0) & (x < w) & (y > 0) & (y < h)
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    pid = yi * w + xi + jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w)
    pid = jnp.where(ok, pid, b * h * w).reshape(-1)

    fsum = jnp.zeros((b * h * w, c), feats.dtype).at[pid].add(
        jnp.where(ok.reshape(-1, 1), feats.reshape(-1, c), 0.0), mode="drop"
    )
    cnt = jnp.zeros((b * h * w,), feats.dtype).at[pid].add(
        ok.reshape(-1).astype(feats.dtype), mode="drop"
    )
    mean = fsum / jnp.maximum(cnt, 1.0)[:, None]
    return mean.reshape(b, h, w, c)


class MLP(nn.Module):
    """Linear stacks matching the reference nn_make_mlp (hunter_toolbox
    :130-158): hidden + non-head layers are Linear(no bias)+BN(1e-3, 0.01)+ReLU;
    head output is a biased Linear."""

    out_channels: int
    hidden_channels: Sequence[int] = ()
    is_head: bool = True

    @nn.compact
    def __call__(self, x, valid=None, train=False):
        dims = list(self.hidden_channels) + [self.out_channels]
        for i, d in enumerate(dims):
            last = i == len(dims) - 1
            if last and self.is_head:
                x = nn.Dense(d, use_bias=True, name=f"lin_{i}")(x)
            else:
                x = nn.Dense(d, use_bias=False, name=f"lin_{i}")(x)
                x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name=f"norm_{i}")(
                    x, mask=valid, use_running_average=not train
                )
                x = nn.relu(x)
        return x


def hard_mining_regression_loss(loss_all, mask_positive, valid, neg_to_pos_ratio=1,
                                num_negative_when_no_positive=100):
    """Static-shape version of the reference hard miner: mean positive loss +
    mean of the top-(num_pos * ratio) negative losses. Dynamic counts become
    rank masks over a descending sort."""
    loss_all = jnp.where(valid, loss_all, 0.0)
    pos = mask_positive & valid
    neg = (~mask_positive) & valid
    num_pos = jnp.sum(pos)
    num_neg = jnp.sum(neg)

    loss_pos_mean = jnp.sum(jnp.where(pos, loss_all, 0.0)) / jnp.maximum(num_pos, 1)

    neg_losses = jnp.where(neg, loss_all, -jnp.inf)
    order = jnp.argsort(-neg_losses)
    sorted_neg = jnp.where(jnp.isfinite(neg_losses[order]), neg_losses[order], 0.0)
    ranks = jnp.arange(loss_all.shape[0])

    k_with_pos = jnp.minimum(num_pos * neg_to_pos_ratio, num_neg)
    k_no_pos = jnp.minimum(num_negative_when_no_positive, num_neg)
    k = jnp.where(num_pos > 0, k_with_pos, k_no_pos)
    top_neg_mean = jnp.sum(jnp.where(ranks < k, sorted_neg, 0.0)) / jnp.maximum(k, 1)

    with_pos = loss_pos_mean + jnp.where(num_neg > 0, top_neg_mean, 0.0)
    no_pos = top_neg_mean
    return jnp.where(num_pos > 0, with_pos, no_pos)
