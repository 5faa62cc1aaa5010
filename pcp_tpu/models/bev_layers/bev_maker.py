"""BEVMaker: frozen single-agent sub-network run inside the DiscoNet model.

Capability match for /root/reference/pcdet/models/bev_layers/bev_maker.py:
simulates each agent computing its own BEV feature map (vfe -> scatter ->
backbone_2d on that agent's points, in the agent's own frame), producing
``batch['bev_img'][agent_idx]``; the 'early' maker computes the early-fusion
teacher BEV (``bev_img_early``) for distillation.

TPU re-design: the reference splits the flat point list per agent
(bev_maker.py:149-209, data-dependent shapes); here each agent's cloud is the
SAME padded (B, N) buffer with a per-agent validity mask — the masked VFE
ignores other agents' points, so no compaction is needed. Agent poses ride in
``batch['se3_from_ego_arr']`` (B, 6, 4, 4). Outputs are stop_gradient'ed and
the params are excluded from optimization (frozen, loaded from single-agent
checkpoints).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_2d import build_backbone_2d
from ..map_to_bev import build_map_to_bev
from ..vfe import build_vfe


class BEVMaker(nn.Module):
    model_cfg: Any
    info: Any
    role: str  # 'bev_maker_rsu' | 'bev_maker_car' | 'bev_maker_early'

    def setup(self):
        cfg = self.model_cfg
        self.maker_type = cfg.get("MAKER_TYPE", self.role.split("_")[-1])
        self.vfe = build_vfe(cfg["VFE"], self.info)
        self.map_to_bev = build_map_to_bev(cfg["MAP_TO_BEV"], self.info)
        self.backbone_2d = build_backbone_2d(
            cfg["BACKBONE_2D"], int(cfg["MAP_TO_BEV"]["NUM_BEV_FEATURES"])
        )

    def _run_branch(self, points, mask, batch_size):
        d = {"points": points, "points_mask": mask, "batch_size": batch_size}
        d = self.vfe(d, train=False)  # frozen: always eval-mode batch stats
        d = self.map_to_bev(d, train=False)
        d = self.backbone_2d(d, train=False)
        return jax.lax.stop_gradient(d["spatial_features_2d"])

    def __call__(self, batch, train=False):
        out = dict(batch)
        points = batch["points"]  # (B, N, 6) x,y,z,i,t,agent_idx
        pmask = batch["points_mask"]
        b = points.shape[0]
        agent_idx = points[..., -1].astype(jnp.int32)

        if self.maker_type == "early":
            if train:  # teacher BEV only needed for the KD loss
                out["bev_img_early"] = self._run_branch(points, pmask, b)
            return out

        se3_from_ego = batch["se3_from_ego_arr"]  # (B, 6, 4, 4)
        agents = (0,) if self.maker_type == "rsu" else (2, 3, 4, 5)
        bev_img = dict(out.get("bev_img", {}))
        for a in agents:
            mask_a = pmask & (agent_idx == a)
            tf = se3_from_ego[:, a]  # (B, 4, 4) agent <- ego
            xyz = points[..., 0:3]
            xyz_a = jnp.einsum("bij,bnj->bni", tf[:, :3, :3], xyz) + tf[:, None, :3, 3]
            pts_a = points.at[..., 0:3].set(xyz_a)
            bev_img[a] = self._run_branch(pts_a, mask_a, b)
        out["bev_img"] = bev_img
        return out
