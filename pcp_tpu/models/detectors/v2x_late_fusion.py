"""V2X late fusion "detector": NMS merge over exchanged boxes.

Capability match for /root/reference/pcdet/models/detectors/v2x_late_fusion.py:
no neural network — concatenates each agent's predicted boxes
(metadata['exchange_boxes']) and runs class-agnostic rotated NMS
(BOX_FUSION_METHOD 'nms') or passes through the ego boxes ('ego_only').

Runs on the host (the inputs are ragged per-agent box lists that never touch
the device); exposed with the same eval interface as the flax detectors via
``is_host_model``.
"""
import numpy as np

from ...utils.nms_np import nms_bev_np


class V2XLateFusion:
    is_host_model = True

    def __init__(self, model_cfg, num_class, dataset_info):
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.dataset_info = dataset_info
        self.post_process_cfg = model_cfg["POST_PROCESSING"]

    def __call__(self, batch, train=False):
        assert not train, "there is nothing to train"
        nms_cfg = self.post_process_cfg["NMS_CONFIG"]
        score_thresh = float(self.post_process_cfg.get("SCORE_THRESH", 0.0))
        method = self.model_cfg.get("BOX_FUSION_METHOD", "nms")

        post_max = int(nms_cfg["NMS_POST_MAXSIZE"])
        b = batch["batch_size"]
        out_boxes = np.zeros((b, post_max, 7), dtype=np.float32)
        out_scores = np.zeros((b, post_max), dtype=np.float32)
        out_labels = np.zeros((b, post_max), dtype=np.int64)
        out_valid = np.zeros((b, post_max), dtype=bool)

        for i, meta in enumerate(batch["metadata"]):
            exchange = meta["exchange_boxes"]
            if method in ("nms", "weighted_nms"):
                stacks = [bx for bx in exchange.values() if bx.shape[0] > 0]
                if not stacks:
                    continue
                boxes = np.concatenate(stacks)  # (N, 9) box7, score, label
                keep = boxes[:, -2] >= score_thresh
                boxes = boxes[keep]
                if boxes.shape[0] == 0:
                    continue
                pre = np.argsort(-boxes[:, -2])[: int(nms_cfg["NMS_PRE_MAXSIZE"])]
                boxes = boxes[pre]
                if method == "weighted_nms":
                    # score-weighted box averaging over each NMS cluster:
                    # exchanged duplicates of one object vote on its geometry
                    # (reduces TP error of stale/offset sender boxes)
                    from ...utils.nms_np import weighted_nms_bev_np

                    fused, sel = weighted_nms_bev_np(
                        boxes[:, :7], boxes[:, -2], float(nms_cfg["NMS_THRESH"]))
                    sel = sel[:post_max]
                    boxes = boxes.copy()
                    boxes[sel, :7] = fused[: len(sel)]
                else:
                    sel = nms_bev_np(boxes[:, :7], boxes[:, -2], float(nms_cfg["NMS_THRESH"]))
                    sel = sel[:post_max]
            elif method == "ego_only":
                boxes = exchange.get(1, np.zeros((0, 9)))
                sel = np.arange(min(boxes.shape[0], post_max))
            else:
                raise NotImplementedError(f"BOX_FUSION_METHOD: {method}")
            n = len(sel)
            out_boxes[i, :n] = boxes[sel, :7]
            out_scores[i, :n] = boxes[sel, -2]
            out_labels[i, :n] = boxes[sel, -1].astype(np.int64)
            out_valid[i, :n] = True

        out = dict(batch)
        out["final_box_dicts"] = {
            "pred_boxes": out_boxes,
            "pred_scores": out_scores,
            "pred_labels": out_labels,
            "pred_valid": out_valid,
        }
        return out
