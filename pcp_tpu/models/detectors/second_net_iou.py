"""SECONDNetIoU — SECOND RPN + IoU-scoring second stage.

Capability match for /root/reference/pcdet/models/detectors/second_net_iou.py:
training loss = RPN loss + IoU-head loss (:28-36); eval post-processing fuses
the first-stage class score with the predicted IoU per NMS_CONFIG.SCORE_TYPE
('iou' | 'cls' | 'weighted_iou_cls', :118-146) before class-agnostic NMS.
"""
import jax
import jax.numpy as jnp

from ...ops.nms import class_agnostic_nms
from .detector_template import Detector3DTemplate


class SECONDNetIoU(Detector3DTemplate):
    def setup(self):
        self.module_list = self.build_module_list()

    def __call__(self, batch, train=False):
        out = dict(batch)
        for module in self.module_list:
            out = module(out, train=train)

        if train:
            loss = 0.0
            tb = {}
            for module in self.module_list:
                if module.__class__.__name__ == "AnchorHeadSingle" and "head_preds" in out:
                    rpn_loss, rpn_tb = module.get_loss(out["head_preds"], out["head_targets"])
                    loss = loss + rpn_loss
                    tb.update(rpn_tb)
            if "roi_head_loss" in out:
                loss = loss + out["roi_head_loss"]
                tb.update(out.get("roi_head_tb", {}))
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            out["final_box_dicts"] = self.post_processing(out)
        return out

    def post_processing(self, batch):
        pp = self.model_cfg["POST_PROCESSING"]
        nms_cfg = pp["NMS_CONFIG"]
        score_type = nms_cfg.get("SCORE_TYPE", "iou")

        iou_preds = jax.nn.sigmoid(batch["batch_cls_preds"][..., 0])  # (B, R)
        cls_preds = batch["roi_scores"]  # already sigmoid'ed at proposal time
        box_preds = batch["batch_box_preds"]
        labels = batch["roi_labels"]
        valid = batch.get("batch_pred_valid", jnp.ones(iou_preds.shape, bool))

        if score_type == "iou":
            nms_scores = iou_preds
        elif score_type == "cls":
            nms_scores = cls_preds
        elif score_type == "weighted_iou_cls":
            w = nms_cfg["SCORE_WEIGHTS"]
            nms_scores = float(w["iou"]) * iou_preds + float(w["cls"]) * cls_preds
        else:
            raise NotImplementedError(f"SCORE_TYPE: {score_type}")

        score_thresh = float(pp.get("SCORE_THRESH", 0.0))

        def one(bp, sc, vm):
            keep_idx, _ = class_agnostic_nms(bp, sc, vm, nms_cfg, score_thresh=score_thresh)
            return keep_idx

        keep_idx = jax.vmap(one)(box_preds, nms_scores, valid)
        sel = jnp.clip(keep_idx, 0)
        ok = keep_idx >= 0
        return {
            "pred_boxes": jnp.take_along_axis(box_preds, sel[..., None], axis=1),
            "pred_scores": jnp.where(ok, jnp.take_along_axis(nms_scores, sel, axis=1), 0.0),
            "pred_labels": jnp.take_along_axis(labels, sel, axis=1).astype(jnp.int32),
            "pred_valid": ok,
        }
