"""Training loop.

Counterpart of /root/reference/tools/train_utils/train_utils.py:
``train_one_epoch`` (per-iter LR schedule driven inside the optimizer,
forward+backward+clip+step fused into the jitted train step) and
``train_model`` (epoch loop, checkpoint rotation, periodic 'latest' snapshot).
Timing meters cover data/step time like the reference's AverageMeters.
"""
import time

import jax
import numpy as np

from ..parallel import make_mesh, replicate_state, shard_batch
from .checkpoint import save_checkpoint
from .train_state import make_train_step


def _to_device_batch(batch, mesh=None):
    import jax.numpy as jnp

    dev = {
        "batch_size": batch["batch_size"],
        "points": jnp.asarray(batch["points"], jnp.float32),
        "points_mask": jnp.asarray(batch["points_mask"]),
    }
    for key in ("gt_boxes", "instances_tf", "se3_from_ego_arr"):
        if key in batch:
            dev[key] = jnp.asarray(batch[key], jnp.float32)
    if "agent_present" in batch:
        dev["agent_present"] = jnp.asarray(batch["agent_present"])
    if mesh is not None:
        dev = shard_batch(mesh, dev)
    return dev


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def train_one_epoch(model, state, tx, train_loader, epoch, logger=None, mesh=None,
                    tb_writer=None, log_interval=50, step_fn=None, profile_dir=None,
                    profile_steps=(5, 8), ckpt_save_dir=None,
                    ckpt_save_time_interval=300, snapshot_tracker=None):
    """profile_dir: capture a jax.profiler device trace for steps
    [profile_steps[0], profile_steps[1]) of epoch 0 (the reference had only
    wall-clock meters; TPU traces are the native observability tool).
    ckpt_save_dir + ckpt_save_time_interval: save an overwriting
    'latest_model' snapshot every interval seconds (reference
    train_utils.py:122-130)."""
    step_fn = step_fn or make_train_step(model, tx)
    data_time, step_time = AverageMeter(), AverageMeter()
    losses = AverageMeter()
    end = time.time()
    it = 0
    profiling = False
    for batch in train_loader:
        if profile_dir is not None and epoch == 0:
            if it == profile_steps[0] and not profiling:
                jax.profiler.start_trace(str(profile_dir))
                profiling = True
            elif it == profile_steps[1] and profiling:
                jax.profiler.stop_trace()
                profiling = False
        data_time.update(time.time() - end)
        dev_batch = _to_device_batch(batch, mesh)
        state, loss, tb = step_fn(state, dev_batch)
        loss = float(loss)
        step_time.update(time.time() - end - data_time.val)
        losses.update(loss)
        if logger is not None and it % log_interval == 0:
            logger.info(
                f"epoch {epoch} it {it}/{len(train_loader)} loss {loss:.4f} "
                f"(avg {losses.avg:.4f}) data {data_time.avg * 1e3:.0f}ms "
                f"step {step_time.avg * 1e3:.0f}ms"
            )
        if tb_writer is not None:
            tb_writer.add_scalar("train/loss", loss, int(state.step))
            for k, v in tb.items():
                try:
                    tb_writer.add_scalar(f"train/{k}", float(v), int(state.step))
                except (TypeError, ValueError):
                    pass
        if (
            ckpt_save_dir is not None
            and snapshot_tracker is not None
            and time.time() - snapshot_tracker.get("t", 0.0) > ckpt_save_time_interval
        ):
            from .checkpoint import save_latest_snapshot

            save_latest_snapshot(state, ckpt_save_dir, epoch, it, logger=logger)
            snapshot_tracker["t"] = time.time()
        it += 1
        end = time.time()
    if profiling:
        jax.profiler.stop_trace()
    return state, losses.avg, step_fn


def train_model(model, state, tx, train_loader, total_epochs, ckpt_dir, logger=None,
                mesh=None, max_ckpt_save_num=30, start_epoch=0, tb_writer=None,
                profile_dir=None, ckpt_save_time_interval=300, precise_bn_batches=0,
                precise_bn_every=0):
    """precise_bn_batches > 0 bakes dataset-average BN statistics (SWA-style
    update_bn) into saved checkpoints: the small-dataset BN-EMA drift that
    previously required ``tools/test.py --bn_recal`` is fixed at the source —
    running stats never affect the train-mode forward, so replacing them is
    free for optimization and only improves eval. By default only the final
    epoch's checkpoint is baked (a recal pass costs ~a third of an epoch);
    ``precise_bn_every=N`` additionally bakes every Nth epoch (for
    ``--eval_all`` workflows that score intermediate checkpoints)."""
    step_fn = make_train_step(model, tx)
    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    if mesh is not None:
        state = replicate_state(mesh, state)

    snapshot_tracker = {"t": time.time()}
    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        state, avg_loss, step_fn = train_one_epoch(
            model, state, tx, train_loader, epoch, logger=logger, mesh=mesh,
            tb_writer=tb_writer, step_fn=step_fn, profile_dir=profile_dir,
            ckpt_save_dir=ckpt_dir, ckpt_save_time_interval=ckpt_save_time_interval,
            snapshot_tracker=snapshot_tracker,
        )
        bake = precise_bn_batches > 0 and (
            epoch == total_epochs - 1
            or (precise_bn_every > 0 and (epoch + 1) % precise_bn_every == 0)
        )
        if bake:
            from .bn_recal import recalibrate_batch_stats

            new_bs = recalibrate_batch_stats(
                model, state.params, state.batch_stats, train_loader,
                lambda b: _to_device_batch(b, mesh),
                max_batches=precise_bn_batches, logger=logger,
            )
            state = state.replace(batch_stats=new_bs)
        save_checkpoint(
            state, ckpt_dir, epoch + 1, int(state.step),
            max_ckpt_save_num=max_ckpt_save_num, logger=logger,
        )
        if logger is not None:
            logger.info(f"epoch {epoch} done, avg loss {avg_loss:.4f}")
    return state
