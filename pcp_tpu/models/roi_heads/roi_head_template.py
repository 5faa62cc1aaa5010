"""Two-stage ROI head infrastructure (flax).

Behavioral counterpart of the reference RoIHeadTemplate + ProposalTargetLayer
(/root/reference/pcdet/models/roi_heads/roi_head_template.py:11-285,
target_assigner/proposal_target_layer.py:8-224), redesigned for XLA:

- proposal_layer: vmapped fixed-shape class-agnostic NMS (the reference loops
  per sample, writing into zero-padded buffers — the padding convention is
  identical, so zero-rois behave the same downstream: they match no GT and
  sample as easy background, exactly like the reference's unfilled rows);
- ProposalTargetLayer: the reference's data-dependent fg/hard-bg/easy-bg
  subsampling (np.random + torch.randint, proposal_target_layer.py:117-194)
  is re-expressed as a fully vectorized fixed-shape selection driven by a JAX
  PRNG: per-group random priorities order each group's members, counts are
  traced scalars, and slot arithmetic fills ROI_PER_IMAGE slots with
  fg | hard_bg | easy_bg in that order, wrapping indices modulo the group
  size when a group is smaller than its quota (the reference samples with
  replacement there);
- canonical-frame GT transform and the smooth-L1 + corner-loss box refinement
  losses mirror roi_head_template.py:132-247.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import class_agnostic_nms
from ...ops.rotated_iou import boxes_iou3d
from ...utils.box_coder_utils import ResidualCoder
from ..loss_fnc.anchor_losses import weighted_smooth_l1
from ..loss_fnc.corner_loss import get_corner_loss_lidar
from ..model_utils.norm import MaskedBatchNorm


def rotate_points_along_z_jnp(points, angle):
    """points (..., N, 3+C), angle (...,) -> rotated about +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([c, s, zeros, -s, c, zeros, zeros, zeros, ones], axis=-1)
    rot = rot.reshape(rot.shape[:-1] + (3, 3))
    xyz = jnp.einsum("...nj,...jk->...nk", points[..., 0:3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def proposal_layer(batch, nms_config, score_thresh=None):
    """First-stage boxes -> fixed-shape ROIs (reference :46-131).

    Returns dict with rois (B, P, 7+C), roi_scores (B, P), roi_labels (B, P)
    1-based, roi_valid (B, P).
    """
    if batch.get("rois") is not None:
        return batch
    box_preds = batch["batch_box_preds"]
    cls_preds = batch["batch_cls_preds"]
    if not batch.get("cls_preds_normalized", False):
        cls_preds = jax.nn.sigmoid(cls_preds)
    if bool(nms_config.get("MULTI_CLASSES_NMS", False)):
        raise NotImplementedError("MULTI_CLASSES_NMS proposal path")

    scores = jnp.max(cls_preds, axis=-1)
    labels = jnp.argmax(cls_preds, axis=-1) + 1  # 1-based like reference :129
    valid = batch.get("batch_pred_valid")
    if valid is None:
        valid = jnp.ones(scores.shape, bool)

    def one(bp, sc, vm):
        keep_idx, _ = class_agnostic_nms(bp, sc, vm, nms_config, score_thresh=score_thresh)
        return keep_idx

    keep_idx = jax.vmap(one)(box_preds, scores, valid)
    sel = jnp.clip(keep_idx, 0)
    ok = keep_idx >= 0
    rois = jnp.where(ok[..., None], jnp.take_along_axis(box_preds, sel[..., None], axis=1), 0.0)
    roi_scores = jnp.where(ok, jnp.take_along_axis(scores, sel, axis=1), 0.0)
    roi_labels = jnp.where(ok, jnp.take_along_axis(labels, sel, axis=1), 0)
    out = dict(batch)
    out["rois"] = rois
    out["roi_scores"] = roi_scores
    out["roi_labels"] = roi_labels.astype(jnp.int32)
    out["roi_valid"] = ok
    out["has_class_labels"] = True
    return out


def _pick_group(key, member, slots, take):
    """Random without-replacement pick of `take` members (wraps when short).

    member: (N,) bool. Returns idx (slots,) int32 into N, valid (slots,)."""
    n = member.shape[0]
    pri = jax.random.uniform(key, (n,)) + jnp.where(member, 0.0, 1e3)
    order = jnp.argsort(pri)  # members shuffled first, non-members after
    count = jnp.sum(member)
    j = jnp.arange(slots)
    idx = order[j % jnp.maximum(count, 1)]
    valid = (j < take) & (count > 0)
    return idx.astype(jnp.int32), valid


def sample_rois_for_rcnn(key, rois, roi_scores, roi_labels, gt_boxes, sampler_cfg,
                         sample_by_each_class=False):
    """Vectorized ProposalTargetLayer.sample_rois_for_rcnn + subsample_rois.

    All inputs single-sample: rois (P, 7+C), gt_boxes (G, 8) zero-padded with
    1-based class in the last column. Returns ROI_PER_IMAGE-sized arrays.
    """
    roi_per_image = int(sampler_cfg["ROI_PER_IMAGE"])
    fg_ratio = float(sampler_cfg["FG_RATIO"])
    reg_fg = float(sampler_cfg["REG_FG_THRESH"])
    cls_fg = float(sampler_cfg["CLS_FG_THRESH"])
    cls_bg = float(sampler_cfg["CLS_BG_THRESH"])
    bg_lo = float(sampler_cfg["CLS_BG_THRESH_LO"])
    hard_ratio = float(sampler_cfg["HARD_BG_RATIO"])
    fg_per_image = int(np.round(fg_ratio * roi_per_image))

    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])  # (P, G)
    if sample_by_each_class:
        same = roi_labels[:, None] == gt_boxes[None, :, -1].astype(jnp.int32)
        iou = jnp.where(same, iou, 0.0)
    gt_is_real = jnp.any(gt_boxes != 0, axis=-1)
    iou = jnp.where(gt_is_real[None, :], iou, 0.0)
    max_overlaps = jnp.max(iou, axis=1)
    gt_assignment = jnp.argmax(iou, axis=1)

    fg_thresh = min(reg_fg, cls_fg)
    fg = max_overlaps >= fg_thresh
    easy = max_overlaps < bg_lo
    hard = (max_overlaps < reg_fg) & (max_overlaps >= bg_lo)
    fg_count = jnp.sum(fg)
    bg_count = jnp.sum(easy) + jnp.sum(hard)

    # quota arithmetic (reference subsample_rois :117-163)
    fg_take = jnp.minimum(fg_per_image, fg_count)
    fg_take = jnp.where(bg_count == 0, roi_per_image, fg_take)  # fg>0, bg==0
    fg_take = jnp.where(fg_count == 0, 0, fg_take)
    bg_take = roi_per_image - fg_take
    hard_count, easy_count = jnp.sum(hard), jnp.sum(easy)
    hard_take = jnp.where(
        (hard_count > 0) & (easy_count > 0),
        jnp.minimum((bg_take * hard_ratio).astype(jnp.int32), hard_count),
        jnp.where(hard_count > 0, bg_take, 0),
    )
    easy_take = bg_take - hard_take

    kf, kh, ke = jax.random.split(key, 3)
    fg_idx, fg_ok = _pick_group(kf, fg, roi_per_image, fg_take)
    hard_idx, hard_ok = _pick_group(kh, hard, roi_per_image, hard_take)
    easy_idx, easy_ok = _pick_group(ke, easy, roi_per_image, easy_take)

    j = jnp.arange(roi_per_image)
    in_fg = j < fg_take
    in_hard = (j >= fg_take) & (j < fg_take + hard_take)
    sel = jnp.where(
        in_fg, fg_idx,
        jnp.where(in_hard, hard_idx[jnp.clip(j - fg_take, 0)], easy_idx[jnp.clip(j - fg_take - hard_take, 0)]),
    )
    # slot validity: fg slots use fg_ok[j] etc.; degenerate no-roi samples give all-invalid
    ok = jnp.where(
        in_fg, fg_ok,
        jnp.where(in_hard, hard_ok[jnp.clip(j - fg_take, 0)], easy_ok[jnp.clip(j - fg_take - hard_take, 0)]),
    )

    out = {
        "rois": rois[sel] * ok[:, None],
        "roi_scores": roi_scores[sel] * ok,
        "roi_labels": jnp.where(ok, roi_labels[sel], 0),
        "roi_ious": jnp.where(ok, max_overlaps[sel], 0.0),
        "gt_of_rois": gt_boxes[gt_assignment[sel]] * ok[:, None],
        "roi_sample_valid": ok,
        "roi_sel": sel.astype(jnp.int32),  # source-slot indices (MPPNet needs
        # them to gather per-trajectory side data for the sampled rois)
    }
    return out


def assign_targets(key, batch, sampler_cfg, sample_by_each_class=False):
    """Vmapped sampling + canonical-frame GT transform (reference :132-163)."""
    b = batch["rois"].shape[0]
    keys = jax.random.split(key, b)
    t = jax.vmap(
        lambda k, r, s, l, g: sample_rois_for_rcnn(
            k, r, s, l, g, sampler_cfg, sample_by_each_class)
    )(keys, batch["rois"], batch["roi_scores"], batch["roi_labels"],
      batch["gt_boxes"])

    ious = t["roi_ious"]
    reg_fg = float(sampler_cfg["REG_FG_THRESH"])
    cls_fg = float(sampler_cfg["CLS_FG_THRESH"])
    cls_bg = float(sampler_cfg["CLS_BG_THRESH"])
    t["reg_valid_mask"] = ((ious > reg_fg) & t["roi_sample_valid"]).astype(jnp.int32)

    score_type = sampler_cfg.get("CLS_SCORE_TYPE", "roi_iou")
    if score_type == "cls":
        labels = (ious > cls_fg).astype(jnp.float32)
        ignore = (ious > cls_bg) & (ious < cls_fg)
        labels = jnp.where(ignore, -1.0, labels)
    elif score_type == "roi_iou":
        fg = ious > cls_fg
        bg = ious < cls_bg
        interval = (~fg) & (~bg)
        labels = fg.astype(jnp.float32)
        labels = jnp.where(interval, (ious - cls_bg) / (cls_fg - cls_bg), labels)
    else:
        raise NotImplementedError(score_type)
    t["rcnn_cls_labels"] = jnp.where(t["roi_sample_valid"], labels, -1.0)

    # canonical transformation of gt_of_rois
    gt = t["gt_of_rois"]
    t["gt_of_rois_src"] = gt
    roi_center = t["rois"][..., 0:3]
    roi_ry = t["rois"][..., 6] % (2 * np.pi)
    gt_shift = jnp.concatenate(
        [gt[..., 0:3] - roi_center, gt[..., 3:6], (gt[..., 6:7] - roi_ry[..., None])],
        axis=-1)
    extra = gt[..., 7:]
    # rotate each (1,3) point: flatten the roi axis into batch for the einsum
    b_, m_ = roi_ry.shape
    rotated = rotate_points_along_z_jnp(
        gt_shift[..., 0:3].reshape(b_ * m_, 1, 3), -roi_ry.reshape(b_ * m_)
    ).reshape(b_, m_, 3)

    heading = gt_shift[..., 6] % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)

    t["gt_of_rois"] = jnp.concatenate(
        [rotated, gt_shift[..., 3:6], heading[..., None], extra], axis=-1)
    return t


class RoIHeadTemplate(nn.Module):
    """Base flax module: shared FC builder + the loss compositions."""

    model_cfg: Any
    num_class: int

    @property
    def box_coder(self):
        target_cfg = self.model_cfg["TARGET_CONFIG"]
        return ResidualCoder(**{k.lower(): v for k, v in
                                target_cfg.get("BOX_CODER_CONFIG", {}).items()})

    def fc_stack(self, x, fc_list, dp_ratio=0.0, train=False, prefix="fc"):
        """[Dense(no bias) + BN + ReLU (+ Dropout)] per entry (reference
        make_fc_layers :29-44; Dropout inserted after the first layer's ReLU
        when DP_RATIO > 0, active only in training)."""
        for i, c in enumerate(fc_list):
            x = nn.Dense(int(c), use_bias=False, name=f"{prefix}_{i}")(x)
            x = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name=f"{prefix}_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            if dp_ratio > 0 and i == 0:
                x = nn.Dropout(rate=float(dp_ratio), deterministic=not train,
                               name=f"{prefix}_dp_{i}")(x)
        return x

    def get_box_cls_layer_loss(self, fwd):
        cfg = self.model_cfg["LOSS_CONFIG"]
        rcnn_cls = fwd["rcnn_cls"].reshape(-1)
        labels = fwd["rcnn_cls_labels"].reshape(-1)
        if cfg["CLS_LOSS"] == "BinaryCrossEntropy":
            p = jax.nn.sigmoid(rcnn_cls)
            eps = 1e-7
            bce = -(labels * jnp.log(jnp.clip(p, eps, 1.0))
                    + (1 - labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
            valid = (labels >= 0).astype(jnp.float32)
            loss = jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), 1.0)
        else:
            raise NotImplementedError(cfg["CLS_LOSS"])
        loss = loss * float(cfg["LOSS_WEIGHTS"]["rcnn_cls_weight"])
        return loss, {"rcnn_loss_cls": loss}

    def get_box_reg_layer_loss(self, fwd):
        cfg = self.model_cfg["LOSS_CONFIG"]
        coder = self.box_coder
        code_size = coder.code_size
        rois = fwd["rois"].reshape(-1, fwd["rois"].shape[-1])[:, :code_size]
        gt_ct = fwd["gt_of_rois"][..., 0:code_size].reshape(-1, code_size)
        gt_src = fwd["gt_of_rois_src"][..., 0:code_size].reshape(-1, code_size)
        rcnn_reg = fwd["rcnn_reg"].reshape(-1, code_size)
        fg_mask = (fwd["reg_valid_mask"].reshape(-1) > 0).astype(jnp.float32)
        fg_sum = jnp.clip(jnp.sum(fg_mask), 1.0)

        rois_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[:, 0:3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])],
            axis=-1)
        reg_targets = coder.encode(gt_ct, rois_anchor)
        l1 = weighted_smooth_l1(
            rcnn_reg[None], reg_targets[None],
            code_weights=cfg["LOSS_WEIGHTS"].get("code_weights"))[0]
        loss_reg = jnp.sum(l1 * fg_mask[:, None]) / fg_sum
        loss_reg = loss_reg * float(cfg["LOSS_WEIGHTS"]["rcnn_reg_weight"])
        tb = {"rcnn_loss_reg": loss_reg}

        if bool(cfg.get("CORNER_LOSS_REGULARIZATION", False)):
            decoded = coder.decode(rcnn_reg, rois_anchor)  # canonical frame
            roi_ry = rois[:, 6]
            xyz = rotate_points_along_z_jnp(decoded[:, None, 0:3], roi_ry)[:, 0]
            boxes_global = jnp.concatenate(
                [xyz + rois[:, 0:3], decoded[:, 3:6], decoded[:, 6:7] + roi_ry[:, None]],
                axis=-1)
            corner = get_corner_loss_lidar(boxes_global[:, :7], gt_src[:, :7])
            loss_corner = jnp.sum(corner * fg_mask) / fg_sum
            loss_corner = loss_corner * float(cfg["LOSS_WEIGHTS"]["rcnn_corner_weight"])
            loss_reg = loss_reg + loss_corner
            tb["rcnn_loss_corner"] = loss_corner
        return loss_reg, tb

    def get_loss(self, fwd):
        cls_loss, tb = self.get_box_cls_layer_loss(fwd)
        reg_loss, tb2 = self.get_box_reg_layer_loss(fwd)
        tb.update(tb2)
        total = cls_loss + reg_loss
        tb["rcnn_loss"] = total
        return total, tb

    def generate_predicted_boxes(self, rois, cls_preds, box_preds):
        """(B, M, ...) rcnn outputs -> decoded global boxes (reference :262-285)."""
        coder = self.box_coder
        code_size = coder.code_size
        roi_ry = rois[..., 6]
        roi_xyz = rois[..., 0:3]
        # Reference (:276) only zeroes xyz, keeping the ROI yaw, so the decoded
        # heading is rt + roi_ry; zeroing it too emits canonical-frame headings.
        local_rois = jnp.concatenate(
            [jnp.zeros_like(roi_xyz), rois[..., 3:6], rois[..., 6:7]],
            axis=-1)
        decoded = coder.decode(box_preds, local_rois)
        b, m = rois.shape[:2]
        xyz = rotate_points_along_z_jnp(
            decoded[..., 0:3].reshape(b * m, 1, 3), roi_ry.reshape(b * m)
        ).reshape(b, m, 3)
        out = jnp.concatenate(
            [xyz + roi_xyz, decoded[..., 3:code_size]], axis=-1)
        return cls_preds, out
