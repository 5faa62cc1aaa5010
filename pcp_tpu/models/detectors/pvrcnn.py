"""PV-RCNN detector — voxel backbone + keypoint VSA + two-stage refinement.

Capability match for /root/reference/pcdet/models/detectors/pv_rcnn.py:
training loss = anchor RPN loss + PointHeadSimple segmentation loss + RCNN
loss (:14-29); eval runs the generic post-processing over refined boxes.
Module order follows the reference template topology (vfe, backbone_3d,
map_to_bev, pfe, backbone_2d, dense_head, point_head, roi_head).
"""
from .detector_template import Detector3DTemplate
from .pointpillar import generic_post_processing


class PVRCNN(Detector3DTemplate):
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
