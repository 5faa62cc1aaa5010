"""Part-A2 ROI head (ROI-aware part/rpn grid pooling + 3D conv towers).

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/partA2_head.py (PartA2FCHead): part
offsets + seg score pooled avg / backbone features pooled max into P^3
canonical grids per ROI, two submanifold conv stacks (part 4->64->c0,
rpn C->64->c0), concat, shared FC, cls/reg towers.

TPU note: the reference runs submanifold sparse convs over the tiny P^3 ROI
grid only because its features arrive as a sparse tensor; here the pooled
grid is already dense, so each "subm" layer is one dense NDHWC conv whose
output is masked back to active cells — mathematically identical to the
submanifold conv (inactive inputs are zero and inactive outputs discarded).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roiaware_pool import roiaware_pool3d
from ..model_utils.norm import MaskedBatchNorm
from .roi_head_template import RoIHeadTemplate, assign_targets, proposal_layer


class _SubM3D(nn.Module):
    """Dense NDHWC 3x3x3 conv + masked BN + ReLU, output masked to active."""

    out_channels: int

    @nn.compact
    def __call__(self, x, active, train=False):
        # x (B, P, P, P, C); active (B, P, P, P) bool
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False,
                    name="conv")(x)
        h = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
            h, mask=active, use_running_average=not train)
        return jnp.where(active[..., None], nn.relu(h), 0.0)


class PartA2FCHead(RoIHeadTemplate):
    input_channels: int = 16
    info: object = None

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        nms_cfg = self.model_cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        out = proposal_layer(out, nms_cfg)

        targets = None
        if train:
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
        pool_cfg = self.model_cfg["ROI_AWARE_POOL"]
        p = int(pool_cfg["POOL_SIZE"])
        c0 = int(pool_cfg["NUM_FEATURES"]) // 2

        coords = out["point_coords"]
        mask = out.get("point_coords_mask")
        rpn_feats = out["point_features"]
        if self.model_cfg.get("DETACH_POINT_FEATURES", False):
            rpn_feats = jax.lax.stop_gradient(rpn_feats)
        scores = jax.lax.stop_gradient(out["point_cls_scores"])  # (B, N)
        part = out["point_part_offset"]  # (B, N, 3)
        seg_thresh = float(self.model_cfg["SEG_MASK_SCORE_THRESH"])
        part = jnp.where((scores >= seg_thresh)[..., None], part, 0.0)
        part_feats = jnp.concatenate([part, scores[..., None]], axis=-1)  # (B,N,4)

        pooled_part = roiaware_pool3d(coords, part_feats, rois[..., :7], p,
                                      pool_method="avg", points_mask=mask)
        pooled_rpn = roiaware_pool3d(coords, rpn_feats, rois[..., :7], p,
                                     pool_method="max", points_mask=mask)
        pooled_part = pooled_part.reshape(b * r, p, p, p, -1)
        pooled_rpn = pooled_rpn.reshape(b * r, p, p, p, -1)
        active = jnp.any(pooled_part != 0, axis=-1)  # reference sparse_idx :208

        x_part = _SubM3D(64, name="conv_part_0")(pooled_part, active, train)
        x_part = _SubM3D(c0, name="conv_part_1")(x_part, active, train)
        x_rpn = _SubM3D(64, name="conv_rpn_0")(pooled_rpn, active, train)
        x_rpn = _SubM3D(c0, name="conv_rpn_1")(x_rpn, active, train)
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)
        h = merged.reshape(b * r, -1)

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
