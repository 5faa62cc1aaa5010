"""PointRCNN second-stage ROI head.

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/pointrcnn_head.py: proposal NMS,
ROI-aware point pooling (score + normalized depth + features), canonical
transform, xyz-up / merge-down 1x1 convs, a chain of single-scale SA modules
ending in GroupAll, and cls/reg FC towers.

TPU shape notes: the per-roi point sets ride a fixed (B*R, S, C) layout
(S = NUM_SAMPLED_POINTS) straight out of ops.roipoint_pool3d; ROI counts are
static per mode (ROI_PER_IMAGE in training, NMS_POST_MAXSIZE at eval), so the
whole second stage jits once per mode. Target sampling randomness comes from
the 'sampling' PRNG stream when provided (deterministic fallback otherwise).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roipoint_pool3d import roipoint_pool3d
from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG, SharedMLP
from .roi_head_template import (RoIHeadTemplate, assign_targets, proposal_layer,
                                rotate_points_along_z_jnp)


class PointRCNNHead(RoIHeadTemplate):
    input_channels: int = 128

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
        pool_cfg = self.model_cfg["ROI_POINT_POOL"]
        coords = out["point_coords"]  # (B, N, 3)
        feats = out["point_features"]  # (B, N, C)
        scores = jax.lax.stop_gradient(out["point_cls_scores"])  # (B, N)
        depth = jnp.linalg.norm(coords, axis=-1) / float(pool_cfg["DEPTH_NORMALIZER"]) - 0.5
        feats_all = jnp.concatenate([scores[..., None], depth[..., None], feats], axis=-1)

        pooled, empty = roipoint_pool3d(
            coords, feats_all, rois,
            num_sampled_points=int(pool_cfg["NUM_SAMPLED_POINTS"]),
            pool_extra_width=pool_cfg["POOL_EXTRA_WIDTH"],
            points_mask=out.get("point_coords_mask"))
        # canonical transform (reference roipool3d_gpu :119-129)
        xyz = pooled[..., 0:3] - rois[:, :, None, 0:3]
        s = pooled.shape[2]
        xyz = rotate_points_along_z_jnp(
            xyz.reshape(b * r, s, 3), -rois[..., 6].reshape(b * r)).reshape(b, r, s, 3)
        pooled = jnp.concatenate([xyz, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)

        use_bn = bool(self.model_cfg.get("USE_BN", False))
        num_prefix = 5  # xyz + point_score + point_depth
        flat = pooled.reshape(b * r, s, -1)
        xyz_feat = SharedMLP(self.model_cfg["XYZ_UP_LAYER"], use_bn=use_bn,
                             name="xyz_up")(flat[..., :num_prefix], train=train)
        merged = jnp.concatenate([xyz_feat, flat[..., num_prefix:]], axis=-1)
        c_out = int(self.model_cfg["XYZ_UP_LAYER"][-1])
        merged = SharedMLP([c_out], use_bn=use_bn, name="merge_down")(merged, train=train)

        sa_cfg = self.model_cfg["SA_CONFIG"]
        l_xyz, l_feat, l_mask = flat[..., 0:3], merged, None
        for k, npoint in enumerate(sa_cfg["NPOINTS"]):
            sa = PointnetSAModuleMSG(
                npoint=None if int(npoint) == -1 else int(npoint),
                radii=[float(sa_cfg["RADIUS"][k])],
                nsamples=[int(sa_cfg["NSAMPLE"][k])],
                mlps=[list(sa_cfg["MLPS"][k])],
                use_xyz=True, use_bn=use_bn, name=f"sa_{k}")
            l_xyz, l_feat, l_mask = sa(l_xyz, l_feat, mask=l_mask, train=train)

        shared = l_feat[:, 0]  # (B*R, C) after GroupAll
        dp = float(self.model_cfg.get("DP_RATIO", 0.0))
        rcnn_cls = self.fc_stack(shared, self.model_cfg["CLS_FC"], dp_ratio=dp,
                                 train=train, prefix="cls_fc")
        rcnn_cls = nn.Dense(self.num_class, name="cls_out")(rcnn_cls)
        rcnn_reg = self.fc_stack(shared, self.model_cfg["REG_FC"], dp_ratio=dp,
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
            cls_preds, box_preds = self.generate_predicted_boxes(
                rois, rcnn_cls, rcnn_reg)
            out["batch_cls_preds"] = cls_preds
            out["batch_box_preds"] = box_preds
            out["batch_pred_valid"] = out["roi_valid"]
            out["cls_preds_normalized"] = False
        return out
