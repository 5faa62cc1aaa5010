"""Masked Lovász-softmax + inverse-frequency CE segmentation loss in JAX.

Counterpart of /root/reference/pcdet/models/loss_fnc/pcaccum_ce_lovasz_loss.py
(CELovaszLoss) and lovasz_softmax.py, extended to honor a validity mask so
padded points neither enter the class statistics nor the Lovász gradient.
"""
import jax
import jax.numpy as jnp

_EPS = 1e-5


def _lovasz_grad_masked(gt_sorted, valid_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors, counting only
    valid entries toward intersection/union."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(valid_sorted - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, _EPS)
    jaccard_shift = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard_shift


def lovasz_softmax(probs, labels, valid):
    """
    Args:
        probs: (N, C) class probabilities; labels: (N,) int; valid: (N,) bool.
    Returns scalar: mean over present classes of the Lovász hinge on the
    per-class errors.
    """
    n, c = probs.shape
    valid_f = valid.astype(probs.dtype)
    losses = []
    present = []
    for cls in range(c):
        fg = ((labels == cls) & valid).astype(probs.dtype)
        class_present = jnp.sum(fg) > 0
        errors = jnp.abs(fg - probs[:, cls]) * valid_f
        order = jnp.argsort(-errors)
        errors_s = errors[order]
        fg_s = fg[order]
        valid_s = valid_f[order]
        grad = _lovasz_grad_masked(fg_s, valid_s)
        losses.append(jnp.where(class_present, jnp.dot(errors_s, grad), 0.0))
        present.append(class_present)
    losses = jnp.stack(losses)
    present = jnp.stack(present).astype(probs.dtype)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)


def ce_lovasz_loss(logits, labels, valid, num_classes, max_weight=50.0):
    """Inverse-frequency-weighted CE + Lovász-softmax (reference
    CELovaszLoss.forward, pcaccum_ce_lovasz_loss.py:20-73)."""
    valid_f = valid.astype(logits.dtype)
    counts = jnp.stack(
        [jnp.sum(((labels == c) & valid).astype(logits.dtype)) for c in range(num_classes)]
    ) + _EPS
    inv_freq = jnp.sum(counts) / counts
    weights = jnp.clip(jnp.sqrt(inv_freq), 0.0, max_weight)

    logp = jax.nn.log_softmax(logits, axis=-1)
    labels_c = jnp.clip(labels, 0, num_classes - 1)
    nll = -jnp.take_along_axis(logp, labels_c[:, None], axis=1)[:, 0]
    w = weights[labels_c] * valid_f
    loss_ce = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), _EPS)

    probs = jax.nn.softmax(logits, axis=-1)
    loss_lovasz = lovasz_softmax(probs, labels_c, valid)
    return loss_ce + loss_lovasz
