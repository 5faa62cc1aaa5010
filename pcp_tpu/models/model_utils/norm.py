"""Normalization layers with padding-aware statistics.

The reference applies ``nn.BatchNorm1d`` over a variable-length point/pillar
list (dynamic_pillar_vfe.py:29). Under TPU static shapes the point buffer is
padded, so batch statistics must be computed over *valid* rows only — a plain
BatchNorm would be polluted by padding. ``MaskedBatchNorm`` reproduces torch
BN semantics (eps/momentum configurable; running stats tracked with
``new = (1 - momentum) * old + momentum * batch`` like torch) over masked rows.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over axis 0..-2 of (..., C) with a row validity mask.

    torch-style momentum: running = (1-m)*running + m*batch (m=0.01 in the
    reference VFE / backbone norms; 0.1 in head norms).
    """

    momentum: float = 0.01
    epsilon: float = 1e-3
    use_running_average: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        use_ra = self.use_running_average if use_running_average is None else use_running_average
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, self.dtype))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, self.dtype))
        scale = self.param("scale", nn.initializers.ones, (c,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.dtype)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            flat = x.reshape(-1, c).astype(jnp.float32)
            if mask is not None:
                w = mask.reshape(-1).astype(jnp.float32)
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(flat * w[:, None], axis=0) / n
                var = jnp.sum(((flat - mean) ** 2) * w[:, None], axis=0) / n
            else:
                n = jnp.asarray(flat.shape[0], jnp.float32)
                mean = jnp.mean(flat, axis=0)
                var = jnp.var(flat, axis=0)
            if not self.is_initializing():
                m = self.momentum
                # torch uses the *unbiased* variance for the running estimate
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
