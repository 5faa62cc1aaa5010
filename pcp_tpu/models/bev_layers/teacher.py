"""Teacher: frozen oracle-corrected single-agent network producing
``teacher_spatial_features_2d`` for HunterJr BEV distillation.

Capability match for /root/reference/workspace/teacher.py:15-186: a frozen
(oracle_corrector -> vfe -> scatter -> backbone_2d) branch whose output the
student's corrector imitates (hunter_jr.py:353-367). Params are excluded from
optimization via the 'teacher' freeze mask and loaded from a pretrained
checkpoint with ``overlay_bev_maker_weights``-style utilities.
"""
from typing import Any

import flax.linen as nn
import jax

from ..backbones_2d import build_backbone_2d
from ..map_to_bev import build_map_to_bev
from ..vfe import build_vfe
from .oracle_corrector import OracleCorrector


class Teacher(nn.Module):
    model_cfg: Any
    info: Any

    def setup(self):
        cfg = self.model_cfg
        self.oracle = OracleCorrector(
            model_cfg=cfg.get("CORRECTOR", {}), info=self.info, name="oracle"
        )
        self.vfe = build_vfe(cfg["VFE"], self.info)
        self.map_to_bev = build_map_to_bev(cfg["MAP_TO_BEV"], self.info)
        self.backbone_2d = build_backbone_2d(
            cfg["BACKBONE_2D"], int(cfg["MAP_TO_BEV"]["NUM_BEV_FEATURES"])
        )

    def __call__(self, batch, train=False):
        out = dict(batch)
        if not train:
            return out  # teacher only feeds the distillation loss
        d = {
            "points": batch["points"],
            "points_mask": batch["points_mask"],
            "batch_size": batch["batch_size"],
        }
        if "instances_tf" in batch:
            d["instances_tf"] = batch["instances_tf"]
        d = self.oracle(d, train=False)
        d = self.vfe(d, train=False)
        d = self.map_to_bev(d, train=False)
        d = self.backbone_2d(d, train=False)
        out["teacher_spatial_features_2d"] = jax.lax.stop_gradient(d["spatial_features_2d"])
        return out
