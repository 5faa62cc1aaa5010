"""Anchor-based dense head (AnchorHeadSingle) — TPU-native.

Capability match for the reference anchor family:
  * ``AnchorGenerator`` (/root/reference/pcdet/models/dense_heads/target_assigner/anchor_generator.py:17-60)
    — numpy, build-time static (anchors are constants folded into the jit).
  * ``AxisAlignedTargetAssigner`` (/root/reference/pcdet/models/dense_heads/target_assigner/axis_aligned_target_assigner.py:37-210)
    — the reference loops per sample / per class on CPU with dynamic fg/bg
    index lists; here the whole assignment is one vmapped dense computation
    over (num_anchors, max_gt) with validity masks (padding rows of gt_boxes
    never match).
  * ``AnchorHeadTemplate`` losses (anchor_head_template.py:104-230): focal
    cls with per-sample positive normalization, smooth-L1 reg with
    sin-difference angle encoding, optional direction-bin CE.
  * ``AnchorHeadSingle`` forward (anchor_head_single.py:43-75): 1x1 convs
    for cls / box / dir over NHWC features.

Box layout is pcdet [x, y, z, dx, dy, dz, heading]; gt_boxes are (B, M, 8)
zero-padded with 1-based class id in the last column.
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.box_coder_utils import PreviousResidualDecoder, ResidualCoder
from ..loss_fnc.anchor_losses import (
    sigmoid_focal_cls_loss,
    weighted_cross_entropy,
    weighted_smooth_l1,
)

_BOX_CODERS = {
    "ResidualCoder": ResidualCoder,
    "PreviousResidualDecoder": PreviousResidualDecoder,
}


def limit_period(val, offset=0.5, period=np.pi):
    """reference common_utils.limit_period (common_utils.py:25-28)."""
    return val - jnp.floor(val / period + offset) * period


def generate_anchors(anchor_generator_cfg, grid_size, point_cloud_range, anchor_ndim=7):
    """Numpy port of AnchorGenerator.generate_anchors (anchor_generator.py:17-60).

    Returns:
        anchors: (ny_f, nx_f, A_loc, anchor_ndim) float32 — all class sets
            concatenated per location in (set, size, rotation) order, matching
            the reference's ``torch.cat(self.anchors, dim=-3)`` flattening
            (anchor_head_template.py:185-190). z dim (anchor heights) must be
            1 per set (true for every pcdet config in the reference).
        num_anchors_per_location: list[int] per set.
    """
    per_set = []
    num_per_loc = []
    fmap = None
    for cfg in anchor_generator_cfg:
        stride = int(cfg["feature_map_stride"])
        gx, gy = int(grid_size[0]) // stride, int(grid_size[1]) // stride
        if fmap is None:
            fmap = (gx, gy)
        assert fmap == (gx, gy), "anchor sets must share a feature map size"
        sizes = np.asarray(cfg["anchor_sizes"], dtype=np.float32)  # (ns, 3)
        rots = np.asarray(cfg["anchor_rotations"], dtype=np.float32)  # (nr,)
        heights = np.asarray(cfg["anchor_bottom_heights"], dtype=np.float32)  # (nz,)
        align_center = bool(cfg.get("align_center", False))
        ns, nr, nz = len(sizes), len(rots), len(heights)
        assert nz == 1, "multiple anchor_bottom_heights per set not supported"
        num_per_loc.append(ns * nr * nz)

        if align_center:
            x_stride = (point_cloud_range[3] - point_cloud_range[0]) / gx
            y_stride = (point_cloud_range[4] - point_cloud_range[1]) / gy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (point_cloud_range[3] - point_cloud_range[0]) / (gx - 1)
            y_stride = (point_cloud_range[4] - point_cloud_range[1]) / (gy - 1)
            x_off, y_off = 0.0, 0.0
        x_shifts = np.arange(
            point_cloud_range[0] + x_off, point_cloud_range[3] + 1e-5, x_stride, dtype=np.float32
        )[:gx]
        y_shifts = np.arange(
            point_cloud_range[1] + y_off, point_cloud_range[4] + 1e-5, y_stride, dtype=np.float32
        )[:gy]
        xx, yy, zz = np.meshgrid(x_shifts, y_shifts, heights, indexing="ij")  # (gx, gy, 1)
        centers = np.stack([xx, yy, zz], axis=-1)  # (gx, gy, 1, 3)
        a = np.broadcast_to(centers[:, :, :, None, None, :], (gx, gy, nz, ns, nr, 3))
        sz = np.broadcast_to(sizes[None, None, None, :, None, :], (gx, gy, nz, ns, nr, 3))
        rr = np.broadcast_to(rots[None, None, None, None, :, None], (gx, gy, nz, ns, nr, 1))
        anchors = np.concatenate([a, sz, rr], axis=-1)  # (gx, gy, nz, ns, nr, 7)
        anchors = anchors.transpose(2, 1, 0, 3, 4, 5)  # (nz, gy, gx, ns, nr, 7)
        anchors = anchors.copy()
        anchors[..., 2] += anchors[..., 5] / 2  # bottom -> center z
        per_set.append(anchors.reshape(gy, gx, ns * nr, 7))

    out = np.concatenate(per_set, axis=2)  # (gy, gx, A_loc, 7)
    if anchor_ndim != 7:
        pad = np.zeros((*out.shape[:-1], anchor_ndim - 7), dtype=np.float32)
        out = np.concatenate([out, pad], axis=-1)
    return out.astype(np.float32), num_per_loc


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned IoU of rotation-snapped BEV boxes
    (reference box_utils.boxes3d_nearest_bev_iou, box_utils.py:314-340).

    Args: boxes_a (N, 7), boxes_b (M, 7). Returns (N, M).
    """

    def aligned(boxes):
        rot = jnp.abs(limit_period(boxes[:, 6], offset=0.5, period=np.pi))
        swap = rot[:, None] >= np.pi / 4
        dims = jnp.where(swap, boxes[:, [4, 3]], boxes[:, [3, 4]])
        return jnp.concatenate([boxes[:, 0:2] - dims / 2, boxes[:, 0:2] + dims / 2], axis=1)

    a = aligned(boxes_a)
    b = aligned(boxes_b)
    ix = jnp.clip(
        jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0]),
        min=0.0,
    )
    iy = jnp.clip(
        jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1]),
        min=0.0,
    )
    inter = ix * iy
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)


class AnchorHeadSingle(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    voxel_size: Sequence[float] = (0.2, 0.2, 8.0)
    predict_boxes_when_training: bool = True

    def setup(self):
        cfg = self.model_cfg
        ta_cfg = cfg["TARGET_ASSIGNER_CONFIG"]
        coder_cls = _BOX_CODERS[ta_cfg["BOX_CODER"]]
        self.box_coder = coder_cls(
            num_dir_bins=int(ta_cfg.get("NUM_DIR_BINS", 6)),
            **dict(ta_cfg.get("BOX_CODER_CONFIG", {})),
        )
        self.anchor_cfgs = list(cfg["ANCHOR_GENERATOR_CONFIG"])
        anchors, n_per_loc = generate_anchors(
            self.anchor_cfgs, self.grid_size, self.point_cloud_range,
            anchor_ndim=self.box_coder.code_size,
        )
        self.anchors_grid = anchors  # (gy, gx, A_loc, 7) numpy constant
        self.num_anchors_per_location = int(sum(n_per_loc))
        self.set_sizes = n_per_loc  # anchors per location of each class set
        self.anchor_class_names = [c["class_name"] for c in self.anchor_cfgs]
        self.matched_thresholds = [float(c["matched_threshold"]) for c in self.anchor_cfgs]
        self.unmatched_thresholds = [float(c["unmatched_threshold"]) for c in self.anchor_cfgs]
        self.match_height = bool(ta_cfg.get("MATCH_HEIGHT", False))
        self.norm_by_num_examples = bool(ta_cfg.get("NORM_BY_NUM_EXAMPLES", False))
        pos_fraction = float(ta_cfg.get("POS_FRACTION", -1.0))
        if pos_fraction >= 0:
            raise NotImplementedError("POS_FRACTION subsampling not supported")
        self.assigner_name = str(ta_cfg.get("NAME", "AxisAlignedTargetAssigner"))
        assert self.assigner_name in ("AxisAlignedTargetAssigner", "ATSSTargetAssigner"), \
            self.assigner_name
        self.atss_topk = int(ta_cfg.get("TOPK", 9))

        pi = 0.01
        self.conv_cls = nn.Dense(
            self.num_anchors_per_location * self.num_class,
            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
            name="conv_cls",
        )
        self.conv_box = nn.Dense(
            self.num_anchors_per_location * self.box_coder.code_size,
            kernel_init=nn.initializers.normal(stddev=0.001),
            name="conv_box",
        )
        self.use_dir = cfg.get("USE_DIRECTION_CLASSIFIER", None) is not None
        if self.use_dir:
            self.num_dir_bins = int(cfg["NUM_DIR_BINS"])
            self.dir_offset = float(cfg.get("DIR_OFFSET", 0.0))
            self.dir_limit_offset = float(cfg.get("DIR_LIMIT_OFFSET", 0.0))
            self.conv_dir = nn.Dense(self.num_anchors_per_location * self.num_dir_bins, name="conv_dir_cls")

    # ------------------------------------------------------------ assignment
    def _assign_single(self, gt_boxes):
        """One sample: gt_boxes (M, 8) zero-padded -> labels/targets/weights
        over all anchors, flattened (gy*gx*A_loc,). Vectorized equivalent of
        assign_targets_single (axis_aligned_target_assigner.py:134-210)."""
        gy, gx, a_loc, ndim = self.anchors_grid.shape
        gt_valid = jnp.any(gt_boxes[:, :7] != 0, axis=-1)
        gt_cls = gt_boxes[:, -1].astype(jnp.int32)

        labels_sets, tgt_sets, argmax_sets = [], [], []
        offset = 0
        for s, cname in enumerate(self.anchor_class_names):
            na_set = self.set_sizes[s]
            anchors = jnp.asarray(
                self.anchors_grid[:, :, offset : offset + na_set, :].reshape(-1, ndim)
            )
            offset += na_set
            class_id = list(self.class_names).index(cname) + 1
            sel = gt_valid & (gt_cls == class_id)

            if self.match_height:
                from ...ops.rotated_iou import boxes_iou3d

                iou = boxes_iou3d(anchors[:, :7], gt_boxes[:, :7])
            else:
                iou = boxes3d_nearest_bev_iou(anchors[:, :7], gt_boxes[:, :7])
            iou = jnp.where(sel[None, :], iou, -1.0)  # masked-out gt never wins

            a2g_idx = jnp.argmax(iou, axis=1)  # (NA,)
            a2g_max = jnp.max(iou, axis=1)
            g2a_max = jnp.max(iou, axis=0)  # (M,)
            # reference: gts whose best anchor overlap is 0 are dropped (:152)
            g2a_max = jnp.where((g2a_max <= 0) | ~sel, -2.0, g2a_max)
            force = jnp.any((iou == g2a_max[None, :]) & sel[None, :] & (iou >= 0), axis=1)

            pos = a2g_max >= self.matched_thresholds[s]
            bg = a2g_max < self.unmatched_thresholds[s]
            cls_of_match = jnp.where(
                jnp.take(sel, a2g_idx), jnp.take(gt_cls, a2g_idx), 0
            )
            labels = jnp.where(
                force | pos, cls_of_match, jnp.where(bg, 0, -1)
            ).astype(jnp.int32)

            fg = labels > 0
            matched_gt = jnp.take(gt_boxes[:, :7], a2g_idx, axis=0)
            enc = self.box_coder.encode(matched_gt, anchors[:, :7])
            tgt = jnp.where(fg[:, None], enc, 0.0)

            labels_sets.append(labels.reshape(gy, gx, na_set))
            tgt_sets.append(tgt.reshape(gy, gx, na_set, -1))

        labels = jnp.concatenate(labels_sets, axis=2).reshape(-1)
        targets = jnp.concatenate(tgt_sets, axis=2).reshape(labels.shape[0], -1)
        if self.norm_by_num_examples:
            num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
            reg_weights = jnp.where(labels > 0, 1.0 / num_examples, 0.0)
        else:
            reg_weights = (labels > 0).astype(jnp.float32)
        return {"box_cls_labels": labels, "box_reg_targets": targets, "reg_weights": reg_weights}

    def _assign_single_atss(self, gt_boxes):
        """Vectorized ATSS assignment (arXiv:1912.02424; reference
        atss_target_assigner.py:76-141): per anchor set, pick the TOPK
        center-closest anchors per GT, threshold their IoUs at mean+std,
        require the anchor center inside the GT BEV box, resolve multi-GT
        anchors by max IoU, and force-match each GT's best anchor. Unlike the
        axis-aligned assigner, ATSS does not filter GTs per anchor class —
        labels carry the matched GT's class (reference :16-52)."""
        gy, gx, a_loc, ndim = self.anchors_grid.shape
        m = gt_boxes.shape[0]
        gt_valid = jnp.any(gt_boxes[:, :7] != 0, axis=-1)
        gt_cls = gt_boxes[:, -1].astype(jnp.int32)
        neg_inf = jnp.float32(-1e9)

        labels_sets, tgt_sets = [], []
        offset = 0
        for s in range(len(self.anchor_class_names)):
            na_set = self.set_sizes[s]
            anchors = jnp.asarray(
                self.anchors_grid[:, :, offset: offset + na_set, :].reshape(-1, ndim))
            offset += na_set
            n = anchors.shape[0]

            if self.match_height:
                from ...ops.rotated_iou import boxes_iou3d

                iou = boxes_iou3d(anchors[:, :7], gt_boxes[:, :7])
            else:
                from ...ops.rotated_iou import boxes_iou_bev

                iou = boxes_iou_bev(anchors[:, :7], gt_boxes[:, :7])
            iou = jnp.where(gt_valid[None, :], iou, neg_inf)

            dist = jnp.linalg.norm(
                anchors[:, None, 0:3] - gt_boxes[None, :, 0:3], axis=-1)
            k = min(self.atss_topk, n)
            _, topk_idx = jax.lax.top_k(-dist.T, k)  # (M, K) nearest anchors
            cand_iou = jnp.take_along_axis(iou.T, topk_idx, axis=1)  # (M, K)
            # torch .std uses Bessel's correction (ddof=1)
            mean = jnp.mean(cand_iou, axis=1)
            std = jnp.sqrt(jnp.sum((cand_iou - mean[:, None]) ** 2, axis=1)
                           / jnp.maximum(k - 1, 1))
            thresh = mean + std + 1e-6
            is_pos = cand_iou >= thresh[:, None]  # (M, K)

            # anchor center inside the GT BEV rectangle
            cand_anchor_xyz = anchors[topk_idx.reshape(-1), 0:3].reshape(m, k, 3)
            rel = cand_anchor_xyz - gt_boxes[:, None, 0:3]
            c, si = jnp.cos(-gt_boxes[:, 6]), jnp.sin(-gt_boxes[:, 6])
            lx = rel[..., 0] * c[:, None] - rel[..., 1] * si[:, None]
            ly = rel[..., 0] * si[:, None] + rel[..., 1] * c[:, None]
            half_l = gt_boxes[:, 3] / 2
            half_w = gt_boxes[:, 4] / 2
            in_gt = (jnp.abs(lx) <= half_l[:, None]) & (jnp.abs(ly) <= half_w[:, None])
            is_pos = is_pos & in_gt & gt_valid[:, None]

            # scatter candidate positives into a dense (N, M) mask
            pos_nm = jnp.zeros((n, m), bool)
            cols = jnp.broadcast_to(jnp.arange(m)[:, None], (m, k))
            pos_nm = pos_nm.at[topk_idx.reshape(-1), cols.reshape(-1)].max(
                is_pos.reshape(-1))
            ious_inf = jnp.where(pos_nm, iou, neg_inf)

            # force-match each valid GT's best anchor (reference :124-127)
            best_anchor = jnp.argmax(iou, axis=0)  # (M,)
            best_iou = jnp.max(iou, axis=0)
            forced_idx = jnp.where(gt_valid, best_anchor, n)  # invalid -> dropped
            a2g_val = jnp.max(ious_inf, axis=1)
            a2g_idx = jnp.argmax(ious_inf, axis=1)
            a2g_idx = a2g_idx.at[forced_idx].set(jnp.arange(m), mode="drop")
            a2g_val = a2g_val.at[forced_idx].set(best_iou, mode="drop")

            labels = jnp.where(a2g_val > neg_inf,
                               jnp.take(gt_cls, a2g_idx), 0).astype(jnp.int32)
            fg = labels > 0
            matched_gt = jnp.take(gt_boxes[:, :7], a2g_idx, axis=0)
            enc = self.box_coder.encode(matched_gt, anchors[:, :7])
            tgt = jnp.where(fg[:, None], enc, 0.0)
            labels_sets.append(labels.reshape(gy, gx, na_set))
            tgt_sets.append(tgt.reshape(gy, gx, na_set, -1))

        labels = jnp.concatenate(labels_sets, axis=2).reshape(-1)
        targets = jnp.concatenate(tgt_sets, axis=2).reshape(labels.shape[0], -1)
        reg_weights = (labels > 0).astype(jnp.float32)
        return {"box_cls_labels": labels, "box_reg_targets": targets,
                "reg_weights": reg_weights}

    def assign_targets(self, gt_boxes):
        if self.assigner_name == "ATSSTargetAssigner":
            return jax.vmap(self._assign_single_atss)(gt_boxes)
        return jax.vmap(self._assign_single)(gt_boxes)

    # ---------------------------------------------------------------- forward
    def __call__(self, batch, train=False):
        x = batch["spatial_features_2d"]  # (B, H, W, C) NHWC
        b, h, w, _ = x.shape
        cls_preds = self.conv_cls(x).reshape(b, -1, self.num_class)
        box_preds = self.conv_box(x).reshape(b, -1, self.box_coder.code_size)
        dir_preds = (
            self.conv_dir(x).reshape(b, -1, self.num_dir_bins) if self.use_dir else None
        )

        out = dict(batch)
        out["head_preds"] = {
            "cls_preds": cls_preds,
            "box_preds": box_preds,
            "dir_cls_preds": dir_preds,
        }
        if train:
            out["head_targets"] = self.assign_targets(batch["gt_boxes"])
        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(cls_preds, box_preds, dir_preds)
            out["batch_cls_preds"] = batch_cls
            out["batch_box_preds"] = batch_box
            out["cls_preds_normalized"] = False
        return out

    # ------------------------------------------------------------------ decode
    def generate_predicted_boxes(self, cls_preds, box_preds, dir_cls_preds=None):
        """anchor_head_template.generate_predicted_boxes (:232-271)."""
        anchors = jnp.asarray(self.anchors_grid.reshape(1, -1, self.anchors_grid.shape[-1]))
        batch_box_preds = self.box_coder.decode(box_preds, anchors)
        if dir_cls_preds is not None:
            dir_labels = jnp.argmax(dir_cls_preds, axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            dir_rot = limit_period(
                batch_box_preds[..., 6] - self.dir_offset, self.dir_limit_offset, period
            )
            heading = dir_rot + self.dir_offset + period * dir_labels.astype(batch_box_preds.dtype)
            batch_box_preds = batch_box_preds.at[..., 6].set(heading)
        if isinstance(self.box_coder, PreviousResidualDecoder):
            heading = limit_period(
                -(batch_box_preds[..., 6] + np.pi / 2), offset=0.5, period=np.pi * 2
            )
            batch_box_preds = batch_box_preds.at[..., 6].set(heading)
        return cls_preds, batch_box_preds

    # -------------------------------------------------------------------- loss
    @staticmethod
    def add_sin_difference(boxes1, boxes2, dim=6):
        """sin(a-b) encoding of the angle residual (anchor_head_template.py:148-154)."""
        rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
        rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
        b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1)
        b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
        return b1, b2

    def get_direction_target(self, reg_targets):
        """(anchor_head_template.py:156-170), one-hot over NUM_DIR_BINS."""
        anchors = jnp.asarray(self.anchors_grid.reshape(1, -1, self.anchors_grid.shape[-1]))
        rot_gt = reg_targets[..., 6] + anchors[..., 6]
        offset_rot = limit_period(rot_gt - self.dir_offset, 0, 2 * np.pi)
        dir_targets = jnp.floor(offset_rot / (2 * np.pi / self.num_dir_bins)).astype(jnp.int32)
        dir_targets = jnp.clip(dir_targets, 0, self.num_dir_bins - 1)
        return jax.nn.one_hot(dir_targets, self.num_dir_bins, dtype=reg_targets.dtype)

    def get_loss(self, head_preds, head_targets):
        """cls + reg (+dir) losses (anchor_head_template.py:104-230)."""
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        cls_preds = head_preds["cls_preds"]
        box_preds = head_preds["box_preds"]
        labels = head_targets["box_cls_labels"]  # (B, NA)
        reg_targets = head_targets["box_reg_targets"]
        batch_size = cls_preds.shape[0]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives + positives).astype(jnp.float32)
        reg_weights = positives.astype(jnp.float32)
        pos_normalizer = jnp.clip(
            jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), min=1.0
        )
        reg_weights = reg_weights / pos_normalizer
        cls_weights = cls_weights / pos_normalizer

        cls_targets = jnp.where(cared, labels, 0)
        if self.num_class == 1:
            cls_targets = jnp.where(positives, 1, cls_targets)  # class agnostic (:117)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1, dtype=cls_preds.dtype)[..., 1:]
        cls_loss = (
            jnp.sum(sigmoid_focal_cls_loss(cls_preds, one_hot, cls_weights))
            / batch_size
            * float(lw["cls_weight"])
        )

        box_preds_sin, reg_targets_sin = self.add_sin_difference(box_preds, reg_targets)
        loc_loss = (
            jnp.sum(
                weighted_smooth_l1(
                    box_preds_sin, reg_targets_sin, reg_weights,
                    code_weights=list(lw["code_weights"]),
                )
            )
            / batch_size
            * float(lw["loc_weight"])
        )
        total = cls_loss + loc_loss
        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}

        if self.use_dir and head_preds.get("dir_cls_preds") is not None:
            dir_targets = self.get_direction_target(reg_targets)
            weights = positives.astype(jnp.float32)
            weights = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), min=1.0)
            dir_loss = (
                jnp.sum(weighted_cross_entropy(head_preds["dir_cls_preds"], dir_targets, weights))
                / batch_size
                * float(lw["dir_weight"])
            )
            total = total + dir_loss
            tb["rpn_loss_dir"] = dir_loss
        tb["rpn_loss"] = total
        return total, tb


class AnchorHeadMulti(AnchorHeadSingle):
    """Grouped-head anchor RPN (reference anchor_head_multi.py:151-297).

    Shares AnchorHeadSingle's anchors, target assignment, losses and decode;
    replaces the prediction towers with an optional 3x3 shared conv followed
    by one SingleHead per RPN_HEAD_CFGS group (1x1 cls/box/dir convs, or the
    SEPARATE_REG_CONFIG middle-conv towers, reference SingleHead :10-148).
    Per-location outputs are concatenated in anchor-set order, so the flat
    anchor layout matches the single-head path exactly.

    SEPARATE_MULTIHEAD (reference :159,190,210-216,233-237): each head
    predicts logits only for its own HEAD_CLS_NAME list; here those logits
    are scattered into the full (num_class) column layout with -20 elsewhere
    (sigmoid ~ 0), so the shared loss/post-processing reproduce the
    reference's per-head slicing + head_label_indices NMS mapping without
    ragged lists — other heads' columns contribute ~0 loss and never pass a
    positive score threshold.
    """

    def setup(self):
        super().setup()
        cfg = self.model_cfg
        self.separate_multihead = bool(cfg.get("SEPARATE_MULTIHEAD", False))
        self.shared_filters = cfg.get("SHARED_CONV_NUM_FILTER")
        self.rpn_head_cfgs = list(cfg["RPN_HEAD_CFGS"])
        # per-head anchor counts: sum of set sizes of the head's class names
        counts = [
            int(sum(self.set_sizes[self.anchor_class_names.index(c)]
                    for c in hc["HEAD_CLS_NAME"]))
            for hc in self.rpn_head_cfgs
        ]
        assert sum(counts) == self.num_anchors_per_location
        self.head_anchor_counts = counts

    @nn.compact
    def _towers(self, x, train):
        cfg = self.model_cfg
        if self.shared_filters is not None:
            x = nn.Conv(int(self.shared_filters), (3, 3), padding=1,
                        use_bias=False, name="shared_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name="shared_bn")(x)
            x = nn.relu(x)
        sep = cfg.get("SEPARATE_REG_CONFIG")
        pi = 0.01
        cls_parts, box_parts, dir_parts = [], [], []
        for i, na in enumerate(self.head_anchor_counts):
            head_nc = (len(self.rpn_head_cfgs[i]["HEAD_CLS_NAME"])
                       if self.separate_multihead else self.num_class)
            if sep is not None:
                def mid(h, prefix):
                    for k in range(int(sep["NUM_MIDDLE_CONV"])):
                        h = nn.Conv(int(sep["NUM_MIDDLE_FILTER"]), (3, 3), padding=1,
                                    use_bias=False, name=f"{prefix}_{k}")(h)
                        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                         epsilon=1e-5, name=f"{prefix}_bn_{k}")(h)
                        h = nn.relu(h)
                    return h
                c = nn.Conv(na * head_nc, (3, 3), padding=1,
                            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
                            name=f"head{i}_cls_out")(mid(x, f"head{i}_cls"))
                regs = []
                for reg_cfg in sep["REG_LIST"]:
                    rname, rchan = reg_cfg.split(":")
                    r = nn.Conv(na * int(rchan), (3, 3), padding=1,
                                name=f"head{i}_reg_{rname}")(mid(x, f"head{i}_reg_{rname}_mid"))
                    regs.append(r.reshape(r.shape[:3] + (na, int(rchan))))
                b = jnp.concatenate(regs, axis=-1)
            else:
                c = nn.Conv(na * head_nc, (1, 1),
                            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
                            name=f"head{i}_cls")(x)
                b = nn.Conv(na * self.box_coder.code_size, (1, 1),
                            kernel_init=nn.initializers.normal(stddev=0.001),
                            name=f"head{i}_box")(x)
                b = b.reshape(b.shape[:3] + (na, self.box_coder.code_size))
            c = c.reshape(c.shape[:3] + (na, head_nc))
            if self.separate_multihead and head_nc != self.num_class:
                # scatter the head's class columns into the full layout
                idxs = [list(self.class_names).index(n)
                        for n in self.rpn_head_cfgs[i]["HEAD_CLS_NAME"]]
                full = jnp.full(c.shape[:4] + (self.num_class,), -20.0, c.dtype)
                full = full.at[..., jnp.asarray(idxs)].set(c)
                c = full
            cls_parts.append(c.reshape(c.shape[:3] + (na, self.num_class)))
            box_parts.append(b)
            if self.use_dir:
                d = nn.Conv(na * self.num_dir_bins, (1, 1), name=f"head{i}_dir")(x)
                dir_parts.append(d.reshape(d.shape[:3] + (na, self.num_dir_bins)))
        cls = jnp.concatenate(cls_parts, axis=3)
        box = jnp.concatenate(box_parts, axis=3)
        dirp = jnp.concatenate(dir_parts, axis=3) if dir_parts else None
        return cls, box, dirp

    def __call__(self, batch, train=False):
        x = batch["spatial_features_2d"]
        b = x.shape[0]
        cls, box, dirp = self._towers(x, train)
        cls_preds = cls.reshape(b, -1, self.num_class)
        box_preds = box.reshape(b, -1, self.box_coder.code_size)
        dir_preds = dirp.reshape(b, -1, self.num_dir_bins) if dirp is not None else None

        out = dict(batch)
        out["head_preds"] = {"cls_preds": cls_preds, "box_preds": box_preds,
                             "dir_cls_preds": dir_preds}
        if train:
            out["head_targets"] = self.assign_targets(batch["gt_boxes"])
        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(cls_preds, box_preds, dir_preds)
            out["batch_cls_preds"] = batch_cls
            out["batch_box_preds"] = batch_box
            out["cls_preds_normalized"] = False
        return out
