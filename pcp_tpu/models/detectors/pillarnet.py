"""PillarNet detector — pillar VFE + sparse-2D pillar backbone +
BaseBEVBackboneV1 + CenterHead.

Capability match for /root/reference/pcdet/models/detectors/pillarnet.py
(:4-38): sequential forward; training loss is the dense head's.
"""
from .detector_template import Detector3DTemplate


class PillarNet(Detector3DTemplate):
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
                name = module.__class__.__name__
                if name == "CenterHead" and "head_preds" in out:
                    head_loss, head_tb = module.get_loss(out["head_preds"], out["head_targets"])
                    loss = loss + head_loss
                    tb.update(head_tb)
                elif name == "AnchorHeadSingle" and "head_preds" in out:
                    head_loss, head_tb = module.get_loss(out["head_preds"], out["head_targets"])
                    loss = loss + head_loss
                    tb.update(head_tb)
            out["loss"] = loss
            out["tb_dict"] = tb
        return out
