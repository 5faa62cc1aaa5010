"""PV-RCNN++ — proposal-centric keypoints + VectorPool aggregation.

Capability match for /root/reference/pcdet/models/detectors/pv_rcnn_plusplus.py:
the module order moves proposal generation (and, in training, ROI target
sampling) BEFORE the PFE so the sectorized proposal-centric sampler draws
keypoints around the proposals (:9-41); losses are RPN + point head + RCNN.
"""
import jax

from ..roi_heads.roi_head_template import assign_targets, proposal_layer
from .detector_template import Detector3DTemplate
from .pointpillar import generic_post_processing


class PVRCNNPlusPlus(Detector3DTemplate):
    def setup(self):
        self.module_list = self.build_module_list()

    def __call__(self, batch, train=False):
        out = dict(batch)
        by_name = {m.__class__.__name__: m for m in self.module_list}
        pre = [m for m in self.module_list
               if m.__class__.__name__ not in
               ("VoxelSetAbstraction", "PointHeadSimple", "PVRCNNHead")]
        for module in pre:
            out = module(out, train=train)

        roi_cfg = self.model_cfg["ROI_HEAD"]
        nms_cfg = roi_cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        out = proposal_layer(out, nms_cfg)
        if train:
            key = (self.make_rng("sampling") if self.has_rng("sampling")
                   else jax.random.PRNGKey(0))
            targets = assign_targets(
                key, out, roi_cfg["TARGET_CONFIG"],
                sample_by_each_class=bool(roi_cfg["TARGET_CONFIG"].get(
                    "SAMPLE_ROI_BY_EACH_CLASS", False)))
            out["rois"] = targets["rois"]
            out["roi_labels"] = targets["roi_labels"]
            out["roi_targets_dict"] = targets

        for name in ("VoxelSetAbstraction", "PointHeadSimple", "PVRCNNHead"):
            if name in by_name:
                out = by_name[name](out, train=train)

        if train:
            loss = 0.0
            tb = {}
            if "AnchorHeadSingle" in by_name and "head_preds" in out:
                rpn_loss, rpn_tb = by_name["AnchorHeadSingle"].get_loss(
                    out["head_preds"], out["head_targets"])
                loss = loss + rpn_loss
                tb.update(rpn_tb)
            if "CenterHead" in by_name and "head_preds" in out:
                head_loss, head_tb = by_name["CenterHead"].get_loss(
                    out["head_preds"], out["head_targets"])
                loss = loss + head_loss
                tb.update(head_tb)
            if "point_head_loss" in out:
                loss = loss + out["point_head_loss"]
                tb.update(out.get("point_head_tb", {}))
            if "roi_head_loss" in out:
                loss = loss + out["roi_head_loss"]
                tb.update(out.get("roi_head_tb", {}))
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            out["final_box_dicts"] = generic_post_processing(
                self.model_cfg, self.num_class, out)
        return out
