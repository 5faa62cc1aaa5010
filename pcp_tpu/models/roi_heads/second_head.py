"""SECONDHead — BEV rotated-ROI IoU scoring head (SECONDNetIoU's 2nd stage).

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/second_head.py: per-ROI rotated
affine_grid/grid_sample (align_corners=True, zero padding) over the detached
2D feature map, shared FC + IoU regression tower, trained against the
ROI-vs-GT IoU labels from the common proposal target layer.

The affine_grid theta (:96-101) reduces to sampling the feature map at
``center_px + R(angle) · (u·dx_px/2, v·dy_px/2)`` for (u, v) on the inclusive
[-1, 1] GRID_SIZE lattice — computed directly here and sampled bilinearly in
one vectorized gather instead of per-sample cuDNN grid_sample calls.
"""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .roi_head_template import RoIHeadTemplate, assign_targets, proposal_layer


def bilinear_sample_zero_pad(feat, px, py):
    """feat (B, H, W, C); px/py (B, M) pixel coords, align_corners=True
    convention; out-of-range contributions are zero (grid_sample zeros pad)."""
    h, w = feat.shape[1:3]
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)

    def corner(yi, xi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = feat.reshape(feat.shape[0], h * w, -1)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * (wgt * inb)[..., None]

    fx, fy = px - x0, py - y0
    return (corner(y0, x0, (1 - fx) * (1 - fy)) + corner(y0, x0 + 1, fx * (1 - fy))
            + corner(y0 + 1, x0, (1 - fx) * fy) + corner(y0 + 1, x0 + 1, fx * fy))


class SECONDHead(RoIHeadTemplate):
    input_channels: int = 512
    info: Any = None

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

        rois = jax.lax.stop_gradient(out["rois"])
        feat = jax.lax.stop_gradient(out["spatial_features_2d"])  # (B, H, W, C)
        b, r = rois.shape[:2]
        g = int(self.model_cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        ds = float(self.model_cfg["ROI_GRID_POOL"]["DOWNSAMPLE_RATIO"])
        vx, vy = self.info.voxel_size[0] * ds, self.info.voxel_size[1] * ds
        minx, miny = self.info.point_cloud_range[0], self.info.point_cloud_range[1]

        u = jnp.linspace(-1.0, 1.0, g)
        uu, vv = jnp.meshgrid(u, u, indexing="xy")  # (g, g): vv rows, uu cols
        uu, vv = uu.reshape(-1), vv.reshape(-1)  # (g*g,)
        cx = (rois[..., 0] - minx) / vx  # (B, R) pixel center
        cy = (rois[..., 1] - miny) / vy
        hx = rois[..., 3] / (2 * vx)
        hy = rois[..., 4] / (2 * vy)
        cosa, sina = jnp.cos(rois[..., 6]), jnp.sin(rois[..., 6])
        # exact theta expansion (reference :96-101):
        # px = cx + dx_px/2 * (u cos a - v sin a); py = cy + dy_px/2 * (u sin a + v cos a)
        px = cx[..., None] + hx[..., None] * uu * cosa[..., None] \
            - hx[..., None] * vv * sina[..., None]
        py = cy[..., None] + hy[..., None] * uu * sina[..., None] \
            + hy[..., None] * vv * cosa[..., None]
        pooled = bilinear_sample_zero_pad(
            feat, px.reshape(b, r * g * g), py.reshape(b, r * g * g))
        pooled = pooled.reshape(b * r, g * g * feat.shape[-1])

        h = pooled
        dp = float(self.model_cfg.get("DP_RATIO", 0.0))
        for i, c in enumerate(self.model_cfg["SHARED_FC"]):
            h = self.fc_stack(h, [c], dp_ratio=dp if i == 0 else 0.0,
                              train=train, prefix=f"shared_fc_{i}")
        rcnn_iou = self.fc_stack(h, self.model_cfg["IOU_FC"], dp_ratio=dp,
                                 train=train, prefix="iou_fc")
        rcnn_iou = nn.Dense(1, name="iou_out")(rcnn_iou).reshape(b, r)

        if train:
            fwd = dict(targets)
            fwd["rcnn_iou"] = rcnn_iou
            loss, tb = self.get_box_iou_layer_loss(fwd)
            out["roi_head_loss"] = loss
            out["roi_head_tb"] = tb
        else:
            out["batch_cls_preds"] = rcnn_iou[..., None]
            out["batch_box_preds"] = out["rois"]
            out["batch_pred_valid"] = out["roi_valid"]
            out["cls_preds_normalized"] = False
        return out

    def get_box_iou_layer_loss(self, fwd):
        """Reference second_head.py:163-196 (IoU regression flavors)."""
        cfg = self.model_cfg["LOSS_CONFIG"]
        iou_pred = fwd["rcnn_iou"].reshape(-1)
        labels = fwd["rcnn_cls_labels"].reshape(-1)
        kind = cfg["IOU_LOSS"]
        if kind == "BinaryCrossEntropy":
            p = jax.nn.sigmoid(iou_pred)
            eps = 1e-7
            per = -(labels * jnp.log(jnp.clip(p, eps, 1.0))
                    + (1 - labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
        elif kind == "L2":
            per = (iou_pred - labels) ** 2
        elif kind == "smoothL1":
            d = jnp.abs(iou_pred - labels)
            beta = 1.0 / 9.0
            per = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        else:
            raise NotImplementedError(kind)
        valid = (labels >= 0).astype(jnp.float32)
        loss = jnp.sum(per * valid) / jnp.clip(jnp.sum(valid), 1.0)
        return loss, {"rcnn_loss_iou": loss, "rcnn_loss": loss}
