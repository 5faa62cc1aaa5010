"""PointPillar / SECONDNet detectors (anchor-head family).

Capability match for /root/reference/pcdet/models/detectors/pointpillar.py:4-34
and second_net.py — sequential module forward, RPN loss from the anchor head,
and the generic ``Detector3DTemplate.post_processing``
(detector3d_template.py:239-345) with class-agnostic or multi-class NMS over
decoded anchor predictions, re-expressed with static shapes:
``final_box_dicts`` arrays are (B, NMS_POST_MAXSIZE[, ...]) with a
``pred_valid`` mask instead of per-sample variable-length lists.
"""
import jax
import jax.numpy as jnp

from ...ops.nms import class_agnostic_nms, multi_classes_nms
from .detector_template import Detector3DTemplate


def generic_post_processing(model_cfg, num_class, batch):
    """Decoded-anchor post-processing -> fixed-shape ``final_box_dicts``.

    Mirrors detector3d_template.post_processing (:239-345): sigmoid-normalize
    class scores unless already normalized, then multi-class or class-agnostic
    NMS; labels are 1-based. Recall statistics are computed host-side in
    ``train/eval_utils.py`` (the reference's generate_recall_record).
    """
    pp = model_cfg["POST_PROCESSING"]
    nms_cfg = pp["NMS_CONFIG"]
    score_thresh = float(pp["SCORE_THRESH"])
    cls_preds = batch["batch_cls_preds"]  # (B, NA, C)
    box_preds = batch["batch_box_preds"]  # (B, NA, 7+)
    src_cls_preds = cls_preds
    if not batch.get("cls_preds_normalized", False):
        cls_preds = jax.nn.sigmoid(cls_preds)

    if bool(nms_cfg.get("MULTI_CLASSES_NMS", False)):
        valid = jnp.ones(box_preds.shape[:2], dtype=bool)

        def one(cp, bp, vm):
            return multi_classes_nms(cp, bp, vm, nms_cfg, score_thresh=score_thresh)

        out = jax.vmap(one)(cls_preds, box_preds, valid)
        # reference maps through multihead_label_mapping; single-head default
        # is 1-based class ids
        out["pred_labels"] = out["pred_labels"] + 1
        out["pred_scores"] = jnp.where(out["pred_valid"], out["pred_scores"], 0.0)
        return out

    max_scores = jnp.max(cls_preds, axis=-1)
    if batch.get("has_class_labels", False):
        # two-stage path: labels come from the ROI stage (:307-309)
        label_preds = batch["roi_labels"]
    else:
        label_preds = jnp.argmax(cls_preds, axis=-1) + 1  # 1-based (:316)
    valid = batch.get("batch_pred_valid")
    if valid is None:
        valid = jnp.ones(max_scores.shape, dtype=bool)

    def one(bp, sc, vm):
        return class_agnostic_nms(bp, sc, vm, nms_cfg, score_thresh=score_thresh)

    keep_idx, _ = jax.vmap(one)(box_preds, max_scores, valid)
    sel = jnp.clip(keep_idx, 0)
    ok = keep_idx >= 0
    boxes_k = jnp.take_along_axis(box_preds, sel[..., None], axis=1)
    if bool(pp.get("OUTPUT_RAW_SCORE", False)):
        raw_max = jnp.max(src_cls_preds, axis=-1)
        scores_k = jnp.take_along_axis(raw_max, sel, axis=1)
    else:
        scores_k = jnp.take_along_axis(max_scores, sel, axis=1)
    labels_k = jnp.take_along_axis(label_preds, sel, axis=1)
    return {
        "pred_boxes": boxes_k,
        "pred_scores": jnp.where(ok, scores_k, 0.0),
        "pred_labels": labels_k.astype(jnp.int32),
        "pred_valid": ok,
    }


class PointPillar(Detector3DTemplate):
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
                if hasattr(module, "get_loss") and "head_preds" in out:
                    rpn_loss, rpn_tb = module.get_loss(out["head_preds"], out["head_targets"])
                    loss = loss + rpn_loss
                    tb.update(rpn_tb)
            tb["loss_rpn"] = loss
            if "backbone_3d_loss" in out:  # focal sparse conv supervision
                loss = loss + out["backbone_3d_loss"]
                tb.update(out.get("backbone_3d_tb", {}))
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            out["final_box_dicts"] = generic_post_processing(
                self.model_cfg, self.num_class, out
            )
        return out


class SECONDNet(PointPillar):
    """reference second_net.py — identical control flow to PointPillar."""
