"""HunterJr scene-flow corrector ("Aligner jr.") — TPU-native.

Capability match for /root/reference/pcdet/models/bev_layers/hunter_jr.py:
point head (3-class seg / 3D flow / 2D instance embedding) on BEV-sampled
point features, training-only object head pooling foreground -> locals
(instance, sweep) -> instances with per-local SE(3) decoding, corrected-BEV
fusion via a learned 2-way conv weighting, and the full loss stack
(CE+Lovász seg, smooth-L1 embedding, hard-mined flow / translation /
rotation(Frobenius) / reconstruction + local-feature distillation).

TPU re-design: the reference compacts groups with ``torch.unique``
(hunter_jr.py:160-187); here locals live in a DENSE (B * max_inst * num_sweeps)
grid — instances_tf already has exactly that layout — so grouping becomes
segment-scatters keyed by ``(b * Ni + inst) * S + sweep`` and instance-level
pooling is a masked reduction over the sweep axis. No dynamic shapes anywhere.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..loss_fnc.lovasz import ce_lovasz_loss
from ..model_utils.norm import MaskedBatchNorm
from .hunter_toolbox import (
    MLP,
    bev_scatter,
    bilinear_interpolate_bev,
    hard_mining_regression_loss,
    quat2mat,
)


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


class ConvBNReLU2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm")(x)
        return nn.relu(x)


class HunterPointHead(nn.Module):
    num_point_features: int
    hidden_channels: Sequence[int] = ()

    @nn.compact
    def __call__(self, points_feat, valid, train=False):
        local_feat = MLP(
            self.num_point_features, self.hidden_channels, is_head=False, name="local_feat_predictor"
        )(points_feat, valid=valid, train=train)
        final_feat = points_feat + local_feat
        cls_logit = MLP(3, self.hidden_channels, name="seg")(final_feat, valid=valid, train=train)
        flow3d = MLP(3, self.hidden_channels, name="reg_flow3d")(final_feat, valid=valid, train=train)
        inst_embed = MLP(2, self.hidden_channels, name="instance_embedding")(
            final_feat, valid=valid, train=train
        )
        return local_feat, cls_logit, flow3d, inst_embed


class HunterObjectHead(nn.Module):
    num_point_features: int
    hidden_channels: Sequence[int] = ()

    @nn.compact
    def __call__(self, fg_xyz, fg_feat, fg_lid, fg_valid, num_locals, s, train=False):
        """Dense-local pooling.

        Args:
            fg_xyz: (P, 3) flattened point xyz; fg_feat: (P, C);
            fg_lid: (P,) dense local id in [0, num_locals), == num_locals drops;
            fg_valid: (P,) bool; num_locals = B * Ni * S; s = num sweeps.
        Returns:
            locals_tf (num_locals, 7), locals_feat (num_locals, C),
            locals_valid (num_locals,), locals_centroid (num_locals, 3).
        """
        c = self.num_point_features
        dt = fg_feat.dtype
        lid = jnp.where(fg_valid, fg_lid, num_locals)

        cnt = jnp.zeros((num_locals,), dt).at[lid].add(fg_valid.astype(dt), mode="drop")
        locals_valid = cnt > 0
        xyz_sum = jnp.zeros((num_locals, 3), dt).at[lid].add(
            jnp.where(fg_valid[:, None], fg_xyz, 0.0), mode="drop"
        )
        locals_centroid = xyz_sum / jnp.maximum(cnt, 1.0)[:, None]
        centered = fg_xyz - locals_centroid[jnp.clip(lid, 0, num_locals - 1)]

        shape_pts = MLP(c, self.hidden_channels, is_head=False, name="points_shape_encoder")(
            centered, valid=fg_valid, train=train
        )
        shape_enc = jnp.zeros((num_locals, c), dt).at[lid].max(
            jnp.where(fg_valid[:, None], shape_pts, 0.0), mode="drop"
        )
        feat_max = jnp.zeros((num_locals, c), dt).at[lid].max(
            jnp.where(fg_valid[:, None], fg_feat, 0.0), mode="drop"
        )
        locals_feat = feat_max + shape_enc  # (num_locals, C)

        # instance-level pooling: dense grid -> reduce over sweep axis
        ni_total = num_locals // s
        lf = locals_feat.reshape(ni_total, s, c)
        lv = locals_valid.reshape(ni_total, s)
        neg_inf = jnp.asarray(-jnp.inf, dt)
        globals_feat = jnp.max(jnp.where(lv[..., None], lf, neg_inf), axis=1)
        globals_feat = jnp.where(jnp.any(lv, axis=1)[:, None], globals_feat, 0.0)

        # target local = occupied local with max sweep index per instance
        sweep_ids = jnp.arange(s)[None, :]
        max_sweep = jnp.max(jnp.where(lv, sweep_ids, -1), axis=1)  # (Ni_total,)
        cent = locals_centroid.reshape(ni_total, s, 3)
        target_centroid = jnp.take_along_axis(
            cent, jnp.clip(max_sweep, 0)[:, None, None].repeat(3, axis=2), axis=1
        )[:, 0]  # (Ni_total, 3)

        full = jnp.concatenate(
            [
                locals_feat,
                jnp.repeat(globals_feat, s, axis=0),
                locals_centroid,
                jnp.repeat(target_centroid, s, axis=0),
            ],
            axis=1,
        )
        locals_feat = MLP(c, self.hidden_channels, is_head=False, name="local_feat_encoder")(
            full, valid=locals_valid, train=train
        )
        locals_tf = MLP(7, (), name="local_tf_decoder")(locals_feat)
        return locals_tf, locals_feat, locals_valid, locals_centroid


class HunterJr(nn.Module):
    model_cfg: Any
    info: Any  # DatasetInfo
    num_bev_features: int

    def setup(self):
        cfg = self.model_cfg
        self.num_sweeps = int(cfg["NUM_SWEEPS"])
        self.bev_image_stride = int(cfg["BEV_IMAGE_STRIDE"])
        self.thresh_point_cls_prob = float(cfg.get("THRESHOLD_POINT_CLS_PROB", 0.3))
        self.sweep_col = int(cfg.get("META_POINTS_FEAT_LOCATION_SWEEP_IDX", -2))
        self.inst_col = int(cfg.get("META_POINTS_FEAT_LOCATION_INSTANCE_IDX", -1))
        c = self.num_bev_features

        self.conv_input = ConvBNReLU2d(c, name="conv_input")
        self.point_head = HunterPointHead(
            c, tuple(cfg.get("POINT_HEAD_HIDDEN_CHANNELS", [])), name="point_head"
        )
        self.object_head = HunterObjectHead(
            c, tuple(cfg.get("OBJ_HEAD_HIDDEN_CHANNELS", [])), name="object_head"
        )
        self.weightor_conv = ConvBNReLU2d(2 * c, name="weightor_conv")
        self.weightor_out = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="weightor_out")

    def __call__(self, batch, train=False):
        out = dict(batch)
        points = batch["points"]  # (B, N, C)
        pmask = batch["points_mask"]
        bev_img = self.conv_input(batch["spatial_features_2d"], train=train)
        b, h, w, c = bev_img.shape
        n = points.shape[1]

        pixel_size = (
            jnp.asarray(self.info.voxel_size[:2], jnp.float32) * self.bev_image_stride
        )
        pc_range = jnp.asarray(self.info.point_cloud_range, jnp.float32)
        points_feat, points_bev_coord = bilinear_interpolate_bev(
            bev_img, points[..., 0:2], pc_range, pixel_size
        )

        flat_feat = points_feat.reshape(b * n, c)
        flat_valid = pmask.reshape(b * n)
        local_feat, cls_logit, flow3d, inst_embed = self.point_head(
            flat_feat, flat_valid, train=train
        )

        if train and "instances_tf" in batch:
            corr_loss, tb = self._train_branch(
                batch, points, pmask, flat_feat, local_feat, cls_logit, flow3d, inst_embed, train
            )
            out["corrector_loss"] = corr_loss
            out["corrector_tb"] = tb

        fused = self._correct_bev_image(
            points, pmask, points_feat, points_bev_coord, cls_logit.reshape(b, n, 3),
            flow3d.reshape(b, n, 3), bev_img, pc_range, pixel_size, train,
        )
        out["spatial_features_2d"] = fused

        if train and "teacher_spatial_features_2d" in batch:
            # NOTE: the reference computes this but never adds it to the total
            # loss (hunter_jr.py:353-367 stores it; get_training_loss omits
            # it) — mirrored here: diagnostic only.
            teacher = batch["teacher_spatial_features_2d"]
            tmask = jnp.linalg.norm(teacher, axis=-1) > 1e-3
            diff = fused - teacher
            sl1 = jnp.sum(jnp.where(jnp.abs(diff) < 1, 0.5 * diff * diff, jnp.abs(diff) - 0.5), axis=-1)
            l_dtl_bev = jnp.sum(jnp.where(tmask, sl1, 0.0)) / jnp.maximum(jnp.sum(tmask), 1)
            if "corrector_tb" in out:
                out["corrector_tb"] = dict(out["corrector_tb"], l_dtl_bev_img=l_dtl_bev)

        if train and "gt_boxes" in batch:
            # reference drops out-of-range gt before the dense head
            # (hunter_toolbox.remove_gt_boxes_outside_range); static-shape
            # version zeroes those rows (class 0 == ignored by the head)
            gt = batch["gt_boxes"]
            lo = jnp.asarray(self.info.point_cloud_range[:3])
            hi = jnp.asarray(self.info.point_cloud_range[3:])
            in_range = jnp.all((gt[..., 0:3] >= lo) & (gt[..., 0:3] < hi), axis=-1)
            out["gt_boxes"] = jnp.where(in_range[..., None], gt, 0.0)

        # exchange / scene-flow products (host-side writer consumes these)
        if not train:
            cls_prob = jax.nn.sigmoid(cls_logit).reshape(b, n, 3)
            out["points_cls_prob"] = cls_prob
            out["points_flow3d"] = flow3d.reshape(b, n, 3)
        return out

    # ------------------------------------------------------------- training
    def _train_branch(self, batch, points, pmask, flat_feat, flat_local_feat,
                      cls_logit, flow3d, inst_embed, train):
        b, n = points.shape[0], points.shape[1]
        s = self.num_sweeps
        instances_tf = batch["instances_tf"]  # (B, Ni, S, 4, 4)
        ni = instances_tf.shape[1]
        num_locals = b * ni * s

        inst = points[..., self.inst_col].astype(jnp.int32)
        sweep = points[..., self.sweep_col].astype(jnp.int32)
        mask_fg = (inst > -1) & pmask & (inst < ni)
        lid = (jnp.arange(b, dtype=jnp.int32)[:, None] * ni + jnp.clip(inst, 0)) * s + jnp.clip(
            sweep, 0, s - 1
        )

        flat_xyz = points[..., 0:3].reshape(b * n, 3)
        flat_fg = mask_fg.reshape(b * n)
        flat_lid = lid.reshape(b * n)

        locals_tf_pred, locals_feat, locals_valid, _ = self.object_head(
            flat_xyz, flat_feat, flat_lid, flat_fg, num_locals, s, train=train
        )

        # ---------------- targets (reference assign_target, :189-249)
        tgt_locals_tf = instances_tf.reshape(num_locals, *instances_tf.shape[3:])[:, :3, :]  # (L,3,4)

        inst_mos = (
            jnp.linalg.norm(instances_tf[:, :, 0, :3, 3], axis=-1) > 0.5
        )  # (B, Ni) moving instances
        flat_inst_mos = inst_mos.reshape(b * ni)
        lid_inst = flat_lid // s
        fg_mos = flat_inst_mos[jnp.clip(lid_inst, 0, b * ni - 1)] & flat_fg
        mask_locals_mos = flat_inst_mos[
            jnp.clip(jnp.arange(num_locals) // s, 0, b * ni - 1)
        ] & locals_valid

        # point class target: 0 bg, 1 static fg, 2 dynamic fg
        tgt_cls = jnp.where(flat_fg, jnp.where(fg_mos, 2, 1), 0)

        # fg embedding target: gt box center xy - point xy (NOTE: indexes
        # gt_boxes rows by raw instance idx, as the reference does)
        gt = batch["gt_boxes"]  # (B, Ng, 8)
        ng = gt.shape[1]
        gt_xy = gt[..., 0:2].reshape(b * ng, 2)
        inst_row = jnp.arange(b, dtype=jnp.int32)[:, None] * ng + jnp.clip(inst, 0, ng - 1)
        fg_box_xy = gt_xy[inst_row.reshape(b * n)]
        tgt_embed = fg_box_xy - flat_xyz[:, 0:2]

        # fg offset target: corrected - original
        fg_tf = tgt_locals_tf[jnp.clip(flat_lid, 0, num_locals - 1)]  # (P, 3, 4)
        corrected = (
            jnp.einsum("pij,pj->pi", fg_tf[:, :3, :3], flat_xyz) + fg_tf[:, :3, 3]
        )
        tgt_offset = corrected - flat_xyz

        # ---------------- losses (reference get_training_loss, :401-494)
        tb = {}
        l_cls = ce_lovasz_loss(cls_logit, tgt_cls, flat_valid_all := pmask.reshape(b * n), 3)
        tb["l_points_cls"] = l_cls

        emb_err = jnp.sum(_smooth_l1(inst_embed - tgt_embed), axis=1)
        l_embed = jnp.sum(jnp.where(flat_fg, emb_err, 0.0)) / jnp.maximum(jnp.sum(flat_fg), 1)
        tb["l_points_embed"] = l_embed

        off_err = jnp.sum(_smooth_l1(flow3d - tgt_offset), axis=1)
        l_offset = hard_mining_regression_loss(
            off_err, fg_mos, flat_fg,
            int(self.model_cfg.get("LOSS_HARD_MINING_STATIC_FG_COEF", 1)),
        )
        tb["l_fg_offset"] = l_offset

        transl_err = jnp.sum(_smooth_l1(locals_tf_pred[:, :3] - tgt_locals_tf[:, :, 3]), axis=1)
        l_transl = hard_mining_regression_loss(
            transl_err, mask_locals_mos, locals_valid,
            int(self.model_cfg.get("LOSS_HARD_MINING_STATIC_LOCALS_COEF", 1)),
        )
        tb["l_locals_transl"] = l_transl

        pred_rot = quat2mat(locals_tf_pred[:, 3:])
        rot_err = jnp.linalg.norm(
            (pred_rot - tgt_locals_tf[:, :, :3]).reshape(num_locals, 9), axis=1
        )
        l_rot = hard_mining_regression_loss(
            rot_err, mask_locals_mos, locals_valid,
            int(self.model_cfg.get("LOSS_HARD_MINING_STATIC_LOCALS_COEF", 1)),
        )
        tb["l_locals_rot"] = l_rot

        # reconstruction: apply predicted local tf to fg, compare with gt-corrected
        pred_tf = jnp.concatenate([pred_rot, locals_tf_pred[:, :3, None]], axis=-1)
        pred_fg_tf = pred_tf[jnp.clip(flat_lid, 0, num_locals - 1)]
        pred_corrected = (
            jnp.einsum("pij,pj->pi", pred_fg_tf[:, :3, :3], flat_xyz) + pred_fg_tf[:, :3, 3]
        )
        recon_err = jnp.sum(_smooth_l1(pred_corrected - corrected), axis=1)
        l_recon = hard_mining_regression_loss(
            recon_err, fg_mos, flat_fg,
            int(self.model_cfg.get("LOSS_HARD_MINING_STATIC_FG_COEF", 1)),
        ) * 0.1
        tb["l_recon"] = l_recon

        # local-feature distillation into the point head
        dtl_err = jnp.sum(
            _smooth_l1(flat_local_feat - locals_feat[jnp.clip(flat_lid, 0, num_locals - 1)]),
            axis=1,
        )
        l_dtl = (
            jnp.sum(jnp.where(flat_fg, dtl_err, 0.0)) / jnp.maximum(jnp.sum(flat_fg), 1) * 0.1
        )
        l_dtl = jnp.where(jnp.any(flat_fg), l_dtl, 0.0)
        tb["l_dtl_locals_feat"] = l_dtl

        any_fg = jnp.any(flat_fg)
        l_transl = jnp.where(any_fg, l_transl, 0.0)
        l_rot = jnp.where(any_fg, l_rot, 0.0)
        l_recon = jnp.where(any_fg, l_recon, 0.0)
        loss = l_cls + l_embed + l_offset + l_transl + l_rot + l_recon + l_dtl
        return loss, tb

    # ------------------------------------------------------------ correction
    def _correct_bev_image(self, points, pmask, points_feat, points_bev_coord,
                           cls_logit, flow3d, bev_img, pc_range, pixel_size, train):
        b, h, w, c = bev_img.shape
        cls_prob = jax.nn.sigmoid(cls_logit)  # (B, N, 3)
        max_prob = jnp.max(cls_prob, axis=-1)
        max_idx = jnp.argmax(cls_prob, axis=-1)
        mask_dyn = (max_prob > self.thresh_point_cls_prob) & (max_idx == 2) & pmask

        moved_xyz = jnp.where(
            mask_dyn[..., None], points[..., 0:3] + flow3d, points[..., 0:3]
        )
        corr_feat, corr_coord = bilinear_interpolate_bev(
            bev_img, moved_xyz[..., 0:2], pc_range, pixel_size
        )
        new_feat = jnp.where(mask_dyn[..., None], corr_feat, points_feat)

        corrected_bev = bev_scatter(corr_coord, new_feat, pmask, h, w)

        weights = self.weightor_conv(
            jnp.concatenate([bev_img, corrected_bev], axis=-1), train=train
        )
        weights = jax.nn.softmax(self.weightor_out(weights), axis=-1)  # (B, H, W, 2)
        return bev_img * weights[..., 0:1] + corrected_bev * weights[..., 1:2]
