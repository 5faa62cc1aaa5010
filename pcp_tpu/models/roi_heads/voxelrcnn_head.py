"""Voxel R-CNN ROI head — ROI-grid pooling straight from sparse voxel features.

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/voxelrcnn_head.py: for each
FEATURES_SOURCE conv level, aggregate voxel features around every ROI grid
point with a multi-radius grouper + shared MLPs, concat across levels, then
shared FC and cls/reg towers.

The reference's `voxel_query` (hash-based neighbor lookup within
MAX_POINTS_OF_NEIGHBOR) is an indexing shortcut for the same radius
neighborhood; here each level is the shared PointnetSAModuleMSG over that
level's voxel centers (same math, one gather).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_3d.pfe.voxel_set_abstraction import get_voxel_centers_from_ids
from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG
from .pvrcnn_head import get_dense_grid_points
from .roi_head_template import (RoIHeadTemplate, assign_targets, proposal_layer,
                                rotate_points_along_z_jnp)


class VoxelRCNNHead(RoIHeadTemplate):
    input_channels: int = 128
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
        pool_cfg = self.model_cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])
        local_grid = get_dense_grid_points(rois, g)
        rot = rotate_points_along_z_jnp(
            local_grid.reshape(b * r, g ** 3, 3), rois[..., 6].reshape(b * r))
        new_xyz = (rot.reshape(b, r, g ** 3, 3) + rois[..., None, 0:3]).reshape(
            b, r * g ** 3, 3)

        pooled_parts = []
        for src in pool_cfg["FEATURES_SOURCE"]:
            src_cfg = pool_cfg["POOL_LAYERS"][src]
            ids, vfeat, dims, _ = out["multi_scale_3d_features"][src]
            ds = int(src_cfg["DOWNSAMPLE_FACTOR"])
            centers, vvalid = get_voxel_centers_from_ids(
                ids, dims, ds, self.info.voxel_size, self.info.point_cloud_range)
            sa = PointnetSAModuleMSG(
                npoint=new_xyz.shape[1],
                radii=[float(x) for x in src_cfg["QUERY_RANGES_RADIUS"]]
                if "QUERY_RANGES_RADIUS" in src_cfg
                else [float(x) for x in src_cfg["POOL_RADIUS"]],
                nsamples=[int(x) for x in src_cfg["NSAMPLE"]],
                mlps=[list(m) for m in src_cfg["MLPS"]],
                use_xyz=True, name=f"pool_{src}")
            _, pooled, _ = sa(centers, vfeat, mask=vvalid, new_xyz=new_xyz, train=train)
            pooled_parts.append(pooled)

        pooled = jnp.concatenate(pooled_parts, axis=-1)
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
