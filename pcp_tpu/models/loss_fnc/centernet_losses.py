"""CenterNet losses in JAX.

Numerics match the reference /root/reference/pcdet/utils/loss_utils.py:
``neg_loss_cornernet`` (:264-300) and ``_reg_loss`` (:314-343).
"""
import jax.numpy as jnp


def focal_loss_centernet(pred, gt):
    """CornerNet-style modified focal loss.

    Args:
        pred: (B, H, W, C) sigmoided + clamped heatmap predictions.
        gt: (B, H, W, C) gaussian target heatmaps.
    Returns scalar loss.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos_inds
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds

    num_pos = jnp.sum(pos_inds)
    pos_loss = jnp.sum(pos_loss)
    neg_loss = jnp.sum(neg_loss)
    # reference: -neg when no positives, else -(pos+neg)/num_pos
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss_centernet(pred, mask, target):
    """Masked L1 regression loss, per-channel (reference ``_reg_loss``).

    Args:
        pred: (B, M, D) predictions gathered at gt center indices.
        mask: (B, M) 0/1 valid-object mask.
        target: (B, M, D) regression targets.
    Returns:
        (D,) per-channel loss, normalized by clamp(num_valid, 1).
    """
    num = jnp.sum(mask.astype(pred.dtype))
    m = mask.astype(pred.dtype)[..., None]
    m = m * (~jnp.isnan(target)).astype(pred.dtype)
    target = jnp.nan_to_num(target)
    diff = jnp.abs(pred * m - target * m)
    loss = jnp.sum(diff, axis=(0, 1))  # (D,)
    return loss / jnp.maximum(num, 1.0)
