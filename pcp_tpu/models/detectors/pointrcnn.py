"""PointRCNN detector — point-based two-stage pipeline.

Capability match for /root/reference/pcdet/models/detectors/point_rcnn.py:
PointNet2MSG backbone over raw points, PointHeadBox first-stage proposals,
PointRCNNHead refinement; training loss = point head loss + rcnn loss
(:14-29); eval runs the generic template post-processing over the refined
boxes with ROI-stage class labels.
"""
from .detector_template import Detector3DTemplate
from .pointpillar import generic_post_processing


class PointRCNN(Detector3DTemplate):
    def setup(self):
        self.module_list = self.build_module_list()

    def __call__(self, batch, train=False):
        out = dict(batch)
        for module in self.module_list:
            out = module(out, train=train)

        if train:
            loss = 0.0
            tb = {}
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
