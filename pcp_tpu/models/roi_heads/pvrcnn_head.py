"""PV-RCNN second-stage ROI head (keypoint ROI-grid pooling).

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/pvrcnn_head.py: score-weighted keypoint
features pooled at a GRID_SIZE^3 lattice of ROI grid points via a multi-radius
set-abstraction (StackSAModuleMSG), flattened into shared FC + cls/reg towers.

TPU shape notes: grid points ride (B, R*G^3, 3) as `new_xyz` of the shared
PointnetSAModuleMSG over the (B, K) keypoint set — the reference's stacked
layout with per-sample counts is unnecessary under padding. Zero-padding rois
produce grid points at the origin exactly like the reference's zero-filled
roi buffers.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG
from .roi_head_template import (RoIHeadTemplate, assign_targets, proposal_layer,
                                rotate_points_along_z_jnp)


def get_dense_grid_points(rois, grid_size):
    """rois (..., 7+) -> local grid offsets (..., G^3, 3) (reference :125-134)."""
    g = grid_size
    idx = np.stack(np.nonzero(np.ones((g, g, g))), axis=-1).astype(np.float32)  # (G^3, 3)
    dense_idx = jnp.asarray(idx)
    local_size = rois[..., None, 3:6]
    return (dense_idx + 0.5) / g * local_size - local_size / 2


class PVRCNNHead(RoIHeadTemplate):
    input_channels: int = 128

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        nms_cfg = self.model_cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        out = proposal_layer(out, nms_cfg)

        targets = None
        if train:
            if out.get("roi_targets_dict") is not None:
                # PV-RCNN++ ordering: the detector sampled targets before the
                # PFE so keypoints concentrate around the sampled ROIs
                targets = out["roi_targets_dict"]
            else:
                key = (self.make_rng("sampling") if self.has_rng("sampling")
                       else jax.random.PRNGKey(0))
                targets = assign_targets(key, out, self.model_cfg["TARGET_CONFIG"],
                                         sample_by_each_class=bool(
                                             self.model_cfg["TARGET_CONFIG"].get(
                                                 "SAMPLE_ROI_BY_EACH_CLASS", False)))
            out["rois"] = targets["rois"]
            out["roi_labels"] = targets["roi_labels"]

        rois = out["rois"]
        b, r = rois.shape[:2]
        pool_cfg = self.model_cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])

        # score-weighted keypoint features (reference :82)
        kp_feats = out["point_features"] * jax.lax.stop_gradient(
            out["point_cls_scores"])[..., None]
        kp_xyz = out["point_coords"]
        kp_mask = out.get("point_coords_mask")

        local_grid = get_dense_grid_points(rois, g)  # (B, R, G^3, 3)
        flat_local = local_grid.reshape(b * r, g ** 3, 3)
        rot = rotate_points_along_z_jnp(flat_local, rois[..., 6].reshape(b * r))
        global_grid = rot.reshape(b, r, g ** 3, 3) + rois[..., None, 0:3]
        new_xyz = global_grid.reshape(b, r * g ** 3, 3)

        grid_mask = jnp.ones(new_xyz.shape[:2], bool)
        if pool_cfg.get("NAME") == "VectorPoolAggregationModuleMSG":
            from ..backbones_3d.vector_pool import VectorPoolAggregationModuleMSG

            vp = VectorPoolAggregationModuleMSG(
                input_channels=kp_feats.shape[-1], config=pool_cfg,
                name="roi_grid_pool")
            pooled = vp(kp_xyz, kp_feats, kp_mask, new_xyz, grid_mask, train=train)
        else:
            # npoint must be non-None to take explicit new_xyz; value unused
            sa = PointnetSAModuleMSG(
                npoint=new_xyz.shape[1],
                radii=[float(x) for x in pool_cfg["POOL_RADIUS"]],
                nsamples=[int(x) for x in pool_cfg["NSAMPLE"]],
                mlps=[list(m) for m in pool_cfg["MLPS"]],
                use_xyz=True, name="roi_grid_pool")
            _, pooled, _ = sa(kp_xyz, kp_feats, mask=kp_mask,
                              new_xyz=new_xyz, train=train)
        pooled = pooled.reshape(b * r, g ** 3 * pooled.shape[-1])

        h = pooled
        dp = float(self.model_cfg.get("DP_RATIO", 0.0))
        for i, c in enumerate(self.model_cfg["SHARED_FC"]):
            h = self.fc_stack(h, [c], dp_ratio=dp if i == 0 else 0.0,
                              train=train, prefix=f"shared_fc_{i}")
        rcnn_cls = self.fc_stack(h, self.model_cfg["CLS_FC"], dp_ratio=dp,
                                 train=train, prefix="cls_fc")
        rcnn_cls = nn.Dense(self.num_class, name="cls_out")(rcnn_cls)
        rcnn_reg = self.fc_stack(h, self.model_cfg["REG_FC"], dp_ratio=dp,
                                 train=train, prefix="reg_fc")
        rcnn_reg = nn.Dense(self.box_coder.code_size * self.num_class,
                            name="reg_out")(rcnn_reg)
        rcnn_cls = rcnn_cls.reshape(b, r, -1)
        rcnn_reg = rcnn_reg.reshape(b, r, -1)

        if train:
            fwd = dict(targets)
            fwd["rcnn_cls"] = rcnn_cls
            fwd["rcnn_reg"] = rcnn_reg
            loss, tb = self.get_loss(fwd)
            out["roi_head_loss"] = loss
            out["roi_head_tb"] = tb
        else:
            cls_preds, box_preds = self.generate_predicted_boxes(rois, rcnn_cls, rcnn_reg)
            out["batch_cls_preds"] = cls_preds
            out["batch_box_preds"] = box_preds
            out["batch_pred_valid"] = out["roi_valid"]
            out["cls_preds_normalized"] = False
        return out
