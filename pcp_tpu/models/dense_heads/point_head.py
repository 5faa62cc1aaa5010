"""Point-wise heads: PointHeadSimple (foreground seg) and PointHeadBox
(PointRCNN's first-stage cls+box head).

Behavioral counterpart of
/root/reference/pcdet/models/dense_heads/point_head_template.py:49-207,
point_head_simple.py and point_head_box.py, redesigned for padded batches:
points ride (B, N, C) with a validity mask instead of a stacked
(N1+N2+..., C) list; target assignment (`assign_stack_targets`) becomes one
vmapped points-in-boxes broadcast (the reference loops per sample calling the
`roiaware_pool3d` CUDA kernel); losses weight invalid rows to zero so padding
never contributes.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.points_in_boxes import points_in_boxes_batch
from ...utils.box_coder_utils import PointResidualCoder
from ..loss_fnc.anchor_losses import sigmoid_focal_cls_loss, weighted_smooth_l1
from ..model_utils.norm import MaskedBatchNorm


def enlarge_box3d(boxes, extra_width):
    """(..., 7+C) with dims grown by extra_width (reference box_utils.py:187)."""
    grown = boxes[..., 3:6] + jnp.asarray(extra_width, boxes.dtype)
    return jnp.concatenate([boxes[..., :3], grown, boxes[..., 6:]], axis=-1)


class _PointHeadBase(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int
    predict_boxes_when_training: bool = False

    def mlp_stack(self, x, fc_cfg, out_channels, mask=None, train=False, prefix="cls"):
        """make_fc_layers (reference point_head_template.py:36-47):
        [Linear(no bias) + BN + ReLU] x len(fc_cfg) + final biased Linear."""
        for i, c in enumerate(fc_cfg):
            x = nn.Dense(int(c), use_bias=False, name=f"{prefix}_{i}")(x)
            x = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name=f"{prefix}_bn_{i}")(
                x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(out_channels, name=f"{prefix}_out")(x)

    def assign_stack_targets(self, coords, mask, gt_boxes, extend_gt_boxes=None,
                             ret_box_labels=False, ret_part_labels=False,
                             set_ignore_flag=True,
                             use_ball_constraint=False, central_radius=2.0,
                             box_coder=None):
        """coords (B,N,3), gt_boxes (B,M,8) zero-padded, 1-based class last."""
        gt_valid = jnp.any(gt_boxes != 0, axis=-1)
        box_idx = points_in_boxes_batch(coords, gt_boxes[..., :7], gt_valid)  # (B,N)
        fg = (box_idx >= 0) & mask
        safe_idx = jnp.clip(box_idx, 0)
        gt_of_pts = jnp.take_along_axis(gt_boxes, safe_idx[..., None], axis=1)  # (B,N,8)

        if set_ignore_flag:
            ext_idx = points_in_boxes_batch(coords, extend_gt_boxes[..., :7], gt_valid)
            ignore = fg ^ ((ext_idx >= 0) & mask)
        elif use_ball_constraint:
            centers = gt_of_pts[..., 0:3].at[..., 2].add(gt_of_pts[..., 5] / 2)
            ball = jnp.linalg.norm(centers - coords, axis=-1) < central_radius
            fg = fg & ball
            ignore = jnp.zeros_like(fg)
        else:
            raise NotImplementedError

        cls_of_fg = gt_of_pts[..., -1].astype(jnp.int32)
        labels = jnp.where(fg, jnp.where(self.num_class == 1, 1, cls_of_fg), 0)
        labels = jnp.where(ignore, -1, labels)
        labels = jnp.where(mask, labels, 0)  # padding rows: plain bg, weighted out later

        out = {"point_cls_labels": labels}
        if ret_box_labels:
            enc = box_coder.encode(gt_of_pts[..., :-1], coords, cls_of_fg)
            out["point_box_labels"] = jnp.where(fg[..., None], enc, 0.0)
        if ret_part_labels:
            # intra-object part location in [0, 1]^3 (reference
            # point_head_template.py:116-124)
            b, n = coords.shape[:2]
            rel = coords - gt_of_pts[..., 0:3]
            c, s = jnp.cos(-gt_of_pts[..., 6]), jnp.sin(-gt_of_pts[..., 6])
            lx = c * rel[..., 0] - s * rel[..., 1]
            ly = s * rel[..., 0] + c * rel[..., 1]
            local = jnp.stack([lx, ly, rel[..., 2]], axis=-1)
            part = local / jnp.maximum(gt_of_pts[..., 3:6], 1e-5) + 0.5
            out["point_part_labels"] = jnp.where(fg[..., None], part, 0.0)
        return out

    def get_part_layer_loss(self, fwd):
        """BCE over sigmoid part offsets (reference point_head_template.py:157-171)."""
        pos = (fwd["point_cls_labels"] > 0).astype(jnp.float32)
        norm = jnp.clip(jnp.sum(pos), 1.0)
        p = jax.nn.sigmoid(fwd["point_part_preds"])
        t = jnp.clip(fwd["point_part_labels"], 0.0, 1.0)
        eps = 1e-7
        bce = -(t * jnp.log(jnp.clip(p, eps, 1.0)) + (1 - t) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
        loss = jnp.sum(jnp.sum(bce, axis=-1) * pos) / (3 * norm)
        w = float(self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"].get("point_part_weight", 1.0))
        loss = loss * w
        return loss, {"point_loss_part": loss}

    def get_cls_layer_loss(self, fwd):
        labels = fwd["point_cls_labels"]  # (B, N)
        preds = fwd["point_cls_preds"]  # (B, N, num_class)
        mask = fwd["points_valid"]
        positives = labels > 0
        negatives = (labels == 0) & mask
        cls_weights = negatives.astype(jnp.float32) + positives.astype(jnp.float32)
        pos_norm = jnp.clip(jnp.sum(positives), 1.0)
        cls_weights = cls_weights / pos_norm
        one_hot = jax.nn.one_hot(jnp.clip(labels, 0), self.num_class + 1)[..., 1:]
        loss = jnp.sum(sigmoid_focal_cls_loss(preds, one_hot, cls_weights))
        w = float(self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]["point_cls_weight"])
        loss = loss * w
        return loss, {"point_loss_cls": loss, "point_pos_num": pos_norm}

    def get_box_layer_loss(self, fwd):
        pos = (fwd["point_cls_labels"] > 0).astype(jnp.float32)
        reg_weights = pos / jnp.clip(jnp.sum(pos), 1.0)
        loss = jnp.sum(weighted_smooth_l1(
            fwd["point_box_preds"], fwd["point_box_labels"], weights=reg_weights))
        w = float(self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]["point_box_weight"])
        loss = loss * w
        return loss, {"point_loss_box": loss}


class PointHeadSimple(_PointHeadBase):
    """Foreground-score head (PV-RCNN's keypoint weighting;
    reference point_head_simple.py)."""

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        feats = (out["point_features_before_fusion"]
                 if self.model_cfg.get("USE_POINT_FEATURES_BEFORE_FUSION", False)
                 else out["point_features"])
        mask = out.get("point_coords_mask")
        cls_preds = self.mlp_stack(
            feats, self.model_cfg["CLS_FC"], self.num_class,
            mask=mask, train=train, prefix="cls")
        out["point_cls_preds"] = cls_preds
        out["point_cls_scores"] = jax.nn.sigmoid(jnp.max(cls_preds, axis=-1))

        if train:
            targets = self.assign_stack_targets(
                out["point_coords"], mask, out["gt_boxes"],
                extend_gt_boxes=enlarge_box3d(
                    out["gt_boxes"],
                    self.model_cfg["TARGET_CONFIG"]["GT_EXTRA_WIDTH"]),
                ret_box_labels=False, set_ignore_flag=True)
            fwd = {"point_cls_labels": targets["point_cls_labels"],
                   "point_cls_preds": cls_preds, "points_valid": mask}
            loss, tb = self.get_cls_layer_loss(fwd)
            out["point_head_loss"] = loss
            out["point_head_tb"] = tb
        return out


class PointHeadBox(_PointHeadBase):
    """PointRCNN first-stage head (reference point_head_box.py): per-point
    class logits + PointResidualCoder box regression; decodes proposals."""

    @property
    def box_coder(self):
        cfg = self.model_cfg["TARGET_CONFIG"]["BOX_CODER_CONFIG"]
        return PointResidualCoder(**{k.lower(): v for k, v in cfg.items()})

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        feats = out["point_features"]
        mask = out["point_coords_mask"]
        coords = out["point_coords"]
        cls_preds = self.mlp_stack(feats, self.model_cfg["CLS_FC"], self.num_class,
                                   mask=mask, train=train, prefix="cls")
        box_preds = self.mlp_stack(feats, self.model_cfg["REG_FC"],
                                   self.box_coder.code_size,
                                   mask=mask, train=train, prefix="box")
        out["point_cls_preds"] = cls_preds
        out["point_cls_scores"] = jax.nn.sigmoid(jnp.max(cls_preds, axis=-1))

        if train:
            targets = self.assign_stack_targets(
                coords, mask, out["gt_boxes"],
                extend_gt_boxes=enlarge_box3d(
                    out["gt_boxes"],
                    self.model_cfg["TARGET_CONFIG"]["GT_EXTRA_WIDTH"]),
                ret_box_labels=True, set_ignore_flag=True,
                box_coder=self.box_coder)
            fwd = {
                "point_cls_labels": targets["point_cls_labels"],
                "point_box_labels": targets["point_box_labels"],
                "point_cls_preds": cls_preds,
                "point_box_preds": box_preds,
                "points_valid": mask,
            }
            cls_loss, tb = self.get_cls_layer_loss(fwd)
            box_loss, tb2 = self.get_box_layer_loss(fwd)
            tb.update(tb2)
            out["point_head_loss"] = cls_loss + box_loss
            out["point_head_tb"] = tb

        if (not train) or self.predict_boxes_when_training:
            pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
            decoded = self.box_coder.decode(box_preds, coords, pred_classes)
            out["batch_cls_preds"] = cls_preds
            out["batch_box_preds"] = decoded
            out["batch_pred_valid"] = mask
            out["cls_preds_normalized"] = False
        return out


class PointIntraPartOffsetHead(_PointHeadBase):
    """Intra-object part-location head (Part-A2's first stage;
    reference point_intra_part_head.py): per-point 3-sigmoid part offsets +
    foreground logits, targets from points-in-gt canonical positions."""

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        feats = out["point_features"]
        mask = out["point_coords_mask"]
        part_preds = self.mlp_stack(
            feats, self.model_cfg["PART_FC"], 3, mask=mask, train=train, prefix="part")
        out["point_part_offset"] = jax.nn.sigmoid(part_preds)
        cls_preds = None
        if not self.model_cfg.get("DISABLE_CLS_LAYER", False):
            cls_preds = self.mlp_stack(
                feats, self.model_cfg["CLS_FC"], self.num_class,
                mask=mask, train=train, prefix="cls")
            out["point_cls_scores"] = jax.nn.sigmoid(jnp.max(cls_preds, axis=-1))

        if train:
            targets = self.assign_stack_targets(
                out["point_coords"], mask, out["gt_boxes"],
                extend_gt_boxes=enlarge_box3d(
                    out["gt_boxes"],
                    self.model_cfg["TARGET_CONFIG"]["GT_EXTRA_WIDTH"]),
                ret_box_labels=False, ret_part_labels=True, set_ignore_flag=True)
            fwd = {"point_cls_labels": targets["point_cls_labels"],
                   "point_part_labels": targets["point_part_labels"],
                   "point_part_preds": part_preds,
                   "points_valid": mask}
            loss, tb = self.get_part_layer_loss(fwd)
            if cls_preds is not None:
                fwd["point_cls_preds"] = cls_preds
                cls_loss, tb2 = self.get_cls_layer_loss(fwd)
                loss = loss + cls_loss
                tb.update(tb2)
            out["point_head_loss"] = loss
            out["point_head_tb"] = tb
        return out
