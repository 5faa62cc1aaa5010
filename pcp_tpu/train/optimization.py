"""Optimizers + LR schedules.

Reproduces the reference training optimization semantics
(/root/reference/tools/train_utils/optimization/):
  * ``adam_onecycle``: Adam(beta2=0.99, bias-corrected) with *decoupled* weight
    decay ``p *= 1 - wd*lr`` (fastai true_wd, applied to every param incl. BN,
    fastai_optim.py:138-151) and the OneCycle schedule driving both LR and
    beta1 ("momentum") with cosine phases (learning_schedules_fastai.py:55-78):
    lr: lr_max/div -> lr_max over pct_start*T, then -> lr_max/div/1e4;
    mom: moms[0] -> moms[1], then back.
  * ``adam`` / ``sgd`` with step-decay LambdaLR fallback.

Implemented as a custom optax GradientTransformation because optax's stock
adamw cannot schedule beta1.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_fns(total_steps, lr_max, moms, div_factor, pct_start):
    """Returns (lr_fn, mom_fn): step (0-based) -> value, matching the
    reference OneCycle phase arithmetic."""
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor

    def phase(step, start, end):
        return (step - start) / jnp.maximum(end - start, 1)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = annealing_cos(low_lr, lr_max, phase(step, 0, a1))
        p2 = annealing_cos(lr_max, low_lr / 1e4, phase(step, a1, total_steps))
        return jnp.where(step < a1, p1, p2)

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = annealing_cos(moms[0], moms[1], phase(step, 0, a1))
        p2 = annealing_cos(moms[1], moms[0], phase(step, a1, total_steps))
        return jnp.where(step < a1, p1, p2)

    return lr_fn, mom_fn


def decay_step_fns(total_iters_each_epoch, optim_cfg):
    """LambdaLR-style step decay (reference optimization/__init__.py:39-47)."""
    lr = float(optim_cfg["LR"])
    decay_steps = [x * total_iters_each_epoch for x in optim_cfg["DECAY_STEP_LIST"]]
    lr_decay = float(optim_cfg["LR_DECAY"])
    lr_clip = float(optim_cfg["LR_CLIP"])

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        cur_decay = jnp.ones_like(step)
        for ds in decay_steps:
            cur_decay = jnp.where(step >= ds, cur_decay * lr_decay, cur_decay)
        return lr * jnp.maximum(cur_decay, lr_clip / lr)

    return lr_fn


class AdamOneCycleState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adam_onecycle(lr_fn, mom_fn, weight_decay, b2=0.99, eps=1e-8):
    """Adam with scheduled beta1 + decoupled weight decay (fastai true_wd)."""

    def init(params):
        return AdamOneCycleState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        step = state.count  # 0-based; scheduler queried before the step
        b1 = mom_fn(step)
        lr = lr_fn(step)
        t = (state.count + 1).astype(jnp.float32)

        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1.0 - jnp.power(b1, t)
        bc2 = 1.0 - jnp.power(b2, t)

        def adam_term(m, v):
            return (m / bc1) / (jnp.sqrt(v / bc2) + eps)

        updates = jax.tree_util.tree_map(
            lambda m, v, p: -(lr * adam_term(m, v) + lr * weight_decay * p),
            mu, nu, params,
        )
        return updates, AdamOneCycleState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(optim_cfg, total_iters_each_epoch, total_epochs,
                    frozen_substrings=("bev_maker", "teacher")):
    """Config-driven optimizer matching the reference ``build_optimizer`` +
    ``build_scheduler``. Returns (optax transform, lr_fn) — lr_fn is exposed
    for logging.

    Params whose tree path contains any of ``frozen_substrings`` get zero
    updates (the reference freezes BEVMaker/Teacher sub-nets via
    requires_grad=False; here stop_gradient keeps their grads zero and this
    mask keeps weight decay off them too)."""
    total_steps = total_iters_each_epoch * total_epochs
    name = optim_cfg["OPTIMIZER"]
    clip = float(optim_cfg.get("GRAD_NORM_CLIP", 0) or 0)

    if name == "adam_onecycle":
        lr_fn, mom_fn = one_cycle_fns(
            total_steps,
            float(optim_cfg["LR"]),
            [float(m) for m in optim_cfg["MOMS"]],
            float(optim_cfg["DIV_FACTOR"]),
            float(optim_cfg["PCT_START"]),
        )
        tx = adam_onecycle(lr_fn, mom_fn, float(optim_cfg["WEIGHT_DECAY"]))
    elif name == "adam":
        lr_fn = decay_step_fns(total_iters_each_epoch, optim_cfg)
        tx = optax.chain(
            optax.add_decayed_weights(float(optim_cfg["WEIGHT_DECAY"])),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda c: -lr_fn(c)),
        )
    elif name == "sgd":
        lr_fn = decay_step_fns(total_iters_each_epoch, optim_cfg)
        tx = optax.chain(
            optax.add_decayed_weights(float(optim_cfg["WEIGHT_DECAY"])),
            optax.trace(decay=float(optim_cfg["MOMENTUM"])),
            optax.scale_by_schedule(lambda c: -lr_fn(c)),
        )
    else:
        raise NotImplementedError(name)

    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    if frozen_substrings:

        def frozen_mask(params):
            def mark(path, _):
                pathstr = jax.tree_util.keystr(path)
                return any(s in pathstr for s in frozen_substrings)

            return jax.tree_util.tree_map_with_path(mark, params)

        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx, lr_fn
