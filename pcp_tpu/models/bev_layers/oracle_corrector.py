"""Oracle corrector: moves each historical foreground point onto its current
pose using the ground-truth ``instances_tf`` — the ideal upper bound used by
the distillation Teacher (reference
/root/reference/pcdet/models/bev_layers/oracle_corrector.py:7-59).
Runs before the VFE, so it rewrites the raw point xyz.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class OracleCorrector(nn.Module):
    model_cfg: Any
    info: Any
    num_bev_features: int = 0

    def __call__(self, batch, train=False):
        out = dict(batch)
        if "instances_tf" not in batch:
            return out
        points = batch["points"]  # (B, N, C)
        tf = batch["instances_tf"]  # (B, Ni, S, 4, 4)
        b, n = points.shape[0], points.shape[1]
        ni, s = tf.shape[1], tf.shape[2]

        sweep_col = int(self.model_cfg.get("META_POINTS_FEAT_LOCATION_SWEEP_IDX", -2))
        inst_col = int(self.model_cfg.get("META_POINTS_FEAT_LOCATION_INSTANCE_IDX", -1))
        inst = points[..., inst_col].astype(jnp.int32)
        sweep = jnp.clip(points[..., sweep_col].astype(jnp.int32), 0, s - 1)
        is_fg = (inst > -1) & (inst < ni) & batch["points_mask"]

        flat_tf = tf.reshape(b * ni * s, 4, 4)
        lid = (jnp.arange(b)[:, None] * ni + jnp.clip(inst, 0)) * s + sweep
        ptf = flat_tf[jnp.clip(lid.reshape(-1), 0, b * ni * s - 1)].reshape(b, n, 4, 4)

        xyz = points[..., 0:3]
        new_xyz = jnp.einsum("bnij,bnj->bni", ptf[..., :3, :3], xyz) + ptf[..., :3, 3]
        xyz = jnp.where(is_fg[..., None], new_xyz, xyz)
        out["points"] = points.at[..., 0:3].set(xyz)
        return out
