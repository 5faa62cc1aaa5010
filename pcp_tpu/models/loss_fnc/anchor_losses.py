"""Anchor-head losses: sigmoid focal, weighted smooth-L1, weighted CE.

Capability match for /root/reference/pcdet/utils/loss_utils.py:9-214 — same
math (tf-style sigmoid cross-entropy with logits, fvcore smooth-L1 with beta,
one-hot CE), expressed as pure functions returning unreduced per-element
losses like the reference modules.
"""
import jax
import jax.numpy as jnp


def sigmoid_bce_with_logits(logits, target):
    """max(x, 0) - x*z + log1p(exp(-|x|)) (reference loss_utils.py:25-42)."""
    return jnp.clip(logits, min=0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_cls_loss(logits, target, weights, alpha=0.25, gamma=2.0):
    """(B, A, C) logits/one-hot target, (B, A) weights -> (B, A, C) loss
    (reference SigmoidFocalClassificationLoss.forward, loss_utils.py:44-73)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    loss = focal_weight * sigmoid_bce_with_logits(logits, target)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def weighted_smooth_l1(pred, target, weights=None, beta=1.0 / 9.0, code_weights=None):
    """(B, A, D) pred/target, (B, A) weights -> (B, A, D) loss
    (reference WeightedSmoothL1Loss.forward, loss_utils.py:104-135)."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    n = jnp.abs(diff)
    if beta < 1e-5:
        loss = n
    else:
        loss = jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits, one_hot_target, weights):
    """(B, A, C) logits/one-hot, (B, A) weights -> (B, A) loss
    (reference WeightedCrossEntropyLoss.forward, loss_utils.py:198-214)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(one_hot_target * logprobs, axis=-1)
    return ce * weights
