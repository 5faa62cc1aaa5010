"""CenterPoint dense head (NHWC, static shapes).

Capability match for /root/reference/pcdet/models/dense_heads/center_head.py:
shared conv -> per-class-group SeparateHead towers (hm / center / center_z /
dim / rot), on-device gaussian target assignment (see target_assigner.py),
CenterNet focal + gathered-L1 losses, and fixed-K decode + rotated NMS.
Decoded predictions keep static shapes (valid-mask instead of filtering).
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..model_utils.centernet_utils import decode_bbox_from_heatmap
from ..loss_fnc.centernet_losses import focal_loss_centernet, reg_loss_centernet
from ...ops.nms import class_agnostic_nms
from .target_assigner import assign_targets_single_head


class SeparateHead(nn.Module):
    """Per-branch conv tower; final hm conv bias initialized to -2.19
    (reference center_head.py:13-47)."""

    sep_head_dict: Any
    init_bias: float = -2.19
    use_bias: bool = False
    dtype: Any = None  # compute dtype (params stay f32); outputs cast to f32

    @nn.compact
    def __call__(self, x, train=False):
        out = {}
        for name, spec in self.sep_head_dict.items():
            y = x
            for k in range(int(spec["num_conv"]) - 1):
                y = nn.Conv(
                    x.shape[-1], (3, 3), padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                    name=f"{name}_conv{k}", dtype=self.dtype,
                )(y)
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"{name}_norm{k}", dtype=self.dtype,
                )(y)
                y = nn.relu(y)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros
            )
            y = nn.Conv(
                int(spec["out_channels"]), (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                bias_init=bias_init, name=f"{name}_out", dtype=self.dtype,
            )(y)
            out[name] = y.astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    voxel_size: Sequence[float]
    predict_boxes_when_training: bool = False
    bf16: bool = False

    def setup(self):
        cfg = self.model_cfg
        self.feature_map_stride = int(cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1))

        names_each_head = []
        id_mapping_each_head = []
        for cur_names in cfg["CLASS_NAMES_EACH_HEAD"]:
            names = [x for x in cur_names if x in self.class_names]
            names_each_head.append(tuple(names))
            id_mapping_each_head.append(
                tuple(self.class_names.index(x) for x in names)
            )
        self.class_names_each_head = tuple(names_each_head)
        self.class_id_mapping_each_head = tuple(id_mapping_each_head)

        shared_ch = int(cfg["SHARED_CONV_CHANNEL"])
        use_bias = bool(cfg.get("USE_BIAS_BEFORE_NORM", False))
        # BF16: convs compute in bfloat16 (params/BN stats f32, logits f32)
        self.dtype = jnp.bfloat16 if (self.bf16 or bool(cfg.get("BF16", False))) else None
        self.shared_conv = nn.Conv(
            shared_ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=use_bias,
            name="shared_conv", dtype=self.dtype,
        )
        self.shared_norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="shared_norm", dtype=self.dtype)

        heads = []
        for idx, names in enumerate(self.class_names_each_head):
            head_dict = {k: dict(v) for k, v in cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"].items()}
            head_dict["hm"] = dict(out_channels=len(names), num_conv=int(cfg["NUM_HM_CONV"]))
            heads.append(SeparateHead(sep_head_dict=head_dict, use_bias=use_bias, dtype=self.dtype, name=f"head_{idx}"))
        self.heads_list = heads

    # ------------------------------------------------------------------ util
    def _head_class_map(self, head_idx):
        """(num_class + 1,) global 1-based class idx -> local 1-based or 0."""
        mapping = np.zeros(self.num_class + 1, dtype=np.int32)
        for local, name in enumerate(self.class_names_each_head[head_idx]):
            mapping[self.class_names.index(name) + 1] = local + 1
        return jnp.asarray(mapping)

    def _pred_iou_at_gt(self, pred, gt_boxes, feat_w, feat_h):
        """(B, M) axis-aligned IoU target of the decoded prediction at each
        gt center, in [-1, 1] (reference center_head.py:207-247 +
        box_utils.get_axis_aligned_iou: AABBs of the rotated BEV rects)."""
        pred = jax.lax.stop_gradient(pred)
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        x0, y0 = float(self.point_cloud_range[0]), float(self.point_cloud_range[1])
        stride = self.feature_map_stride

        def one(center, center_z, dim, rot, gt):
            px = jnp.clip((gt[:, 0] - x0) / vx / stride, 0, feat_w - 0.5).astype(jnp.int32)
            py = jnp.clip((gt[:, 1] - y0) / vy / stride, 0, feat_h - 0.5).astype(jnp.int32)
            cx = center[py, px, 0] + px
            cy = center[py, px, 1] + py
            bx = cx * stride * vx + x0
            by = cy * stride * vy + y0
            bdim = jnp.exp(dim[py, px])
            ang = jnp.arctan2(rot[py, px, 1], rot[py, px, 0])

            def aabb(x, y, dx, dy, yaw):
                c, s = jnp.abs(jnp.cos(yaw)), jnp.abs(jnp.sin(yaw))
                ex = c * dx / 2 + s * dy / 2
                ey = s * dx / 2 + c * dy / 2
                return x - ex, y - ey, x + ex, y + ey

            p = aabb(bx, by, bdim[:, 0], bdim[:, 1], ang)
            g = aabb(gt[:, 0], gt[:, 1], gt[:, 3], gt[:, 4], gt[:, 6])
            iw = jnp.clip(jnp.minimum(p[2], g[2]) - jnp.maximum(p[0], g[0]), min=0.0)
            ih = jnp.clip(jnp.minimum(p[3], g[3]) - jnp.maximum(p[1], g[1]), min=0.0)
            inter = iw * ih
            area = lambda b: jnp.clip(b[2] - b[0], min=0.0) * jnp.clip(b[3] - b[1], min=0.0)
            union = area(p) + area(g) - inter
            iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
            return 2.0 * iou - 1.0

        return jax.vmap(one)(pred["center"], pred["center_z"], pred["dim"], pred["rot"], gt_boxes)

    def assign_targets(self, gt_boxes, feat_w, feat_h, pred_dicts=None):
        """gt_boxes: (B, M, >=8) zero-padded. Returns per-head target dicts.
        When the head predicts 'iou' (HEAD_ORDER), the calibration target is
        appended as the last reg channel from the current predictions."""
        ta = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        head_order = list(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])
        with_iou = "iou" in head_order and pred_dicts is not None
        code_size = 8  # box7 -> [off2, z, logdim3, cos, sin]; + extras if present
        if gt_boxes.shape[-1] > 8:
            code_size = 8 + (gt_boxes.shape[-1] - 8)
        if with_iou:
            code_size += 1
        targets = []
        for idx, names in enumerate(self.class_names_each_head):
            iou_t = (
                self._pred_iou_at_gt(pred_dicts[idx], gt_boxes, feat_w, feat_h)
                if with_iou
                else None
            )

            def fn(g, it=None, idx=idx, names=names):
                return assign_targets_single_head(
                    g,
                    self._head_class_map(idx),
                    num_classes=len(names),
                    feat_w=feat_w,
                    feat_h=feat_h,
                    stride=self.feature_map_stride,
                    pc_range=jnp.asarray(self.point_cloud_range, dtype=jnp.float32),
                    voxel_size=jnp.asarray(self.voxel_size, dtype=jnp.float32),
                    gaussian_overlap=float(ta["GAUSSIAN_OVERLAP"]),
                    min_radius=int(ta["MIN_RADIUS"]),
                    num_max_objs=int(ta["NUM_MAX_OBJS"]),
                    code_size=code_size,
                    iou_target=it,
                )

            if with_iou:
                hm, boxes, inds, mask = jax.vmap(fn)(gt_boxes, iou_t)
            else:
                hm, boxes, inds, mask = jax.vmap(lambda g: fn(g))(gt_boxes)
            targets.append({"heatmap": hm, "target_boxes": boxes, "inds": inds, "mask": mask})
        return targets

    # --------------------------------------------------------------- forward
    def __call__(self, batch, train=False):
        x = self.shared_conv(batch["spatial_features_2d"])
        x = self.shared_norm(x, use_running_average=not train)
        x = nn.relu(x)

        pred_dicts = [head(x, train=train) for head in self.heads_list]

        out = dict(batch)
        out["head_preds"] = pred_dicts
        if train:
            gt = batch["gt_boxes"]
            # pad/trim gt to NUM_MAX_OBJS capacity
            cap = int(self.model_cfg["TARGET_ASSIGNER_CONFIG"]["NUM_MAX_OBJS"])
            m = gt.shape[1]
            if m < cap:
                gt = jnp.pad(gt, ((0, 0), (0, cap - m), (0, 0)))
            elif m > cap:
                gt = gt[:, :cap]
            out["head_targets"] = self.assign_targets(gt, x.shape[2], x.shape[1], pred_dicts=pred_dicts)

        if not train or self.predict_boxes_when_training:
            out["final_box_dicts"] = self.generate_predicted_boxes(pred_dicts)
        return out

    # ----------------------------------------------------------------- loss
    def get_loss(self, head_preds, head_targets):
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        head_order = list(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])
        total, tb = 0.0, {}
        for idx, (pred, tgt) in enumerate(zip(head_preds, head_targets)):
            hm_pred = jnp.clip(jax.nn.sigmoid(pred["hm"]), 1e-4, 1 - 1e-4)
            hm_loss = focal_loss_centernet(hm_pred, tgt["heatmap"]) * float(lw["cls_weight"])

            reg_pred = jnp.concatenate([pred[k] for k in head_order], axis=-1)  # (B,H,W,D)
            b, h, w, d = reg_pred.shape
            flat = reg_pred.reshape(b, h * w, d)
            gathered = jnp.take_along_axis(flat, tgt["inds"][..., None], axis=1)  # (B,M,D)
            reg_loss = reg_loss_centernet(gathered, tgt["mask"], tgt["target_boxes"])
            code_w = jnp.asarray(list(lw["code_weights"]))[: reg_loss.shape[0]]
            loc_loss = jnp.sum(reg_loss * code_w) * float(lw["loc_weight"])

            total = total + hm_loss + loc_loss
            tb[f"hm_loss_head_{idx}"] = hm_loss
            tb[f"loc_loss_head_{idx}"] = loc_loss
        tb["rpn_loss"] = total
        return total, tb

    # --------------------------------------------------------------- decode
    def generate_predicted_boxes(self, pred_dicts):
        pp = self.model_cfg["POST_PROCESSING"]
        nms_cfg = pp["NMS_CONFIG"]
        k = int(pp["MAX_OBJ_PER_SAMPLE"])
        post_max = int(nms_cfg["NMS_POST_MAXSIZE"])

        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for idx, pred in enumerate(pred_dicts):
            hm = jax.nn.sigmoid(pred["hm"])
            if bool(pp.get("CALIB_CLS_SCORE", False)) and "iou" in pred:
                # predicted-IoU score calibration (reference center_head.py:320-322)
                alpha = float(pp.get("CALIB_CLS_SCORE_ALPHA", 0.5))
                iou = jnp.clip((pred["iou"] + 1.0) / 2.0, 0.0, 1.0)
                hm = jnp.power(hm, 1.0 - alpha) * jnp.power(iou, alpha)
            decoded = decode_bbox_from_heatmap(
                heatmap=hm,
                rot_cos=pred["rot"][..., 0:1],
                rot_sin=pred["rot"][..., 1:2],
                center=pred["center"],
                center_z=pred["center_z"],
                dim=jnp.exp(pred["dim"]),
                vel=pred.get("vel"),
                point_cloud_range=self.point_cloud_range,
                voxel_size=self.voxel_size,
                feature_map_stride=self.feature_map_stride,
                k=k,
                score_thresh=float(pp["SCORE_THRESH"]),
                post_center_limit_range=pp["POST_CENTER_LIMIT_RANGE"],
            )

            keep_idx, _ = jax.vmap(
                lambda b, s, v: class_agnostic_nms(b, s, v, nms_cfg, score_thresh=None)
            )(decoded["pred_boxes"], decoded["pred_scores"], decoded["valid"])
            sel = jnp.clip(keep_idx, 0)
            valid_k = keep_idx >= 0
            boxes_k = jnp.take_along_axis(decoded["pred_boxes"], sel[..., None], axis=1)
            scores_k = jnp.take_along_axis(decoded["pred_scores"], sel, axis=1)
            labels_k = jnp.take_along_axis(decoded["pred_labels"], sel, axis=1)
            mapping = jnp.asarray(self.class_id_mapping_each_head[idx])
            labels_k = mapping[jnp.clip(labels_k, 0, mapping.shape[0] - 1)]

            all_boxes.append(boxes_k)
            all_scores.append(jnp.where(valid_k, scores_k, 0.0))
            all_labels.append(labels_k)
            all_valid.append(valid_k)

        return {
            "pred_boxes": jnp.concatenate(all_boxes, axis=1),
            "pred_scores": jnp.concatenate(all_scores, axis=1),
            "pred_labels": jnp.concatenate(all_labels, axis=1) + 1,  # 1-based, ref :355
            "pred_valid": jnp.concatenate(all_valid, axis=1),
        }
