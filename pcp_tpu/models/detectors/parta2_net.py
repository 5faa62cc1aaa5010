"""Part-A2 detector — UNet voxel backbone, intra-part first stage, ROI-aware
part-pooled second stage.

Capability match for /root/reference/pcdet/models/detectors/PartA2_net.py:
training loss = RPN loss + point (part+seg) loss + RCNN loss; eval via the
generic template post-processing over the refined boxes.
"""
from .detector_template import Detector3DTemplate
from .pointpillar import generic_post_processing


class PartA2Net(Detector3DTemplate):
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
