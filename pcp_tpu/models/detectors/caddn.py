"""CaDDN — monocular 3D detection via categorical depth distributions.

Capability match for /root/reference/pcdet/models/detectors/caddn.py:
ImageVFE (DDN + frustum-to-voxel) -> Conv2DCollapse -> BEV backbone ->
anchor head; training loss = RPN loss + depth (DDN) loss.
"""
from .detector_template import Detector3DTemplate
from .pointpillar import generic_post_processing


class CaDDN(Detector3DTemplate):
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
            if "vfe_loss" in out:
                loss = loss + out["vfe_loss"]
                tb.update(out.get("vfe_tb", {}))
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            out["final_box_dicts"] = generic_post_processing(
                self.model_cfg, self.num_class, out)
        return out
