"""CenterPoint detector — the detector class used by every V2X model config.

Capability match for /root/reference/pcdet/models/detectors/centerpoint.py:
sequential module-list forward; training loss = CenterHead loss (+ HunterJr
corrector loss + DiscoNet distillation loss when those modules are present);
eval emits fixed-shape ``final_box_dicts``.
"""
from .detector_template import Detector3DTemplate


class CenterPoint(Detector3DTemplate):
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
                if hasattr(module, "get_loss") and "head_preds" in out and module.__class__.__name__ == "CenterHead":
                    head_loss, head_tb = module.get_loss(out["head_preds"], out["head_targets"])
                    loss = loss + head_loss
                    tb.update(head_tb)
            if "corrector_loss" in out:
                loss = loss + out["corrector_loss"]
                tb["corrector_loss"] = out["corrector_loss"]
                tb.update(out.get("corrector_tb", {}))
            if "distill_loss" in out:
                loss = loss + out["distill_loss"]
                tb["distill_loss"] = out["distill_loss"]
            out["loss"] = loss
            out["tb_dict"] = tb
        return out
