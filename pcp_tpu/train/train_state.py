"""Train state + jitted step factory.

The functional counterpart of the reference train loop internals
(/root/reference/tools/train_utils/train_utils.py:28-68: forward, backward,
grad clip, optimizer step): a single jitted ``train_step`` doing
value_and_grad over the detector loss, optimizer update, and batch-stats
update. Data parallelism comes from sharding the batch over a mesh and
letting XLA insert the gradient all-reduce (see pcp_tpu.parallel.mesh).
"""
from typing import Any

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any
    # base key for per-step stochastic streams (ROI subsampling, dropout);
    # derived from the run seed so seed sweeps vary the sampling randomness.
    # Not checkpointed: resume recreates it from the same run seed and
    # fold_in(step) reproduces the per-step stream.
    rng: Any = None


def create_train_state(model, tx, rng, example_batch):
    variables = model.init(rng, example_batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=0,
        rng=jax.random.fold_in(rng, 0x5A3D),  # decouple from the init stream
    )


def make_train_step(model, tx, donate=True):
    def train_step(state, batch):
        # per-step PRNG for stochastic modules (ROI target subsampling,
        # dropout); folded from the step counter so resume reproduces the
        # stream while distinct run seeds give distinct streams
        base = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        step_key = jax.random.fold_in(base, state.step)
        rngs = {"sampling": step_key,
                "dropout": jax.random.fold_in(step_key, 1)}

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            return out["loss"], (out["tb_dict"], updates["batch_stats"])

        (loss, (tb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, loss, tb

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    def eval_step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, train=False
        )
        return out["final_box_dicts"]

    return jax.jit(eval_step)
