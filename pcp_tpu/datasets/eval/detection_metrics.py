"""nuScenes detection-protocol evaluation, implemented natively (numpy).

Replaces the reference's dependency on nuscenes-devkit's ``DetectionEval``
(/root/reference/pcdet/datasets/v2x_sim/v2x_sim_eval_utils.py:169-204, keyed by
lidar_token rather than sample_token). Implements the ``detection_cvpr_2019``
protocol:

  * matching by BEV center distance at thresholds {0.5, 1, 2, 4} m, greedy
    over predictions sorted by score (dataset-wide), each GT matched once;
  * AP = normalized area of the 101-point interpolated precision/recall curve
    with min_recall = min_precision = 0.1 (official ``calc_ap``);
  * TP metrics on matches at the 2.0 m threshold: ATE (center distance),
    ASE (1 - IoU of aligned boxes), AOE (yaw difference, wrapped);
  * mAP = mean over classes x thresholds; NDS-style score = (5*mAP +
    sum(1 - min(1, tp_err)))/ (5 + n_tp_metrics) over available TP metrics.
"""
import json
from pathlib import Path

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL_PTS = 101


def _yaw_diff(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    return np.minimum(d, 2 * np.pi - d)


def _aligned_iou3d(box_a, box_b):
    """IoU of boxes translated to the origin with aligned yaw (official ASE)."""
    inter = np.prod(np.minimum(box_a[3:6], box_b[3:6]))
    union = np.prod(box_a[3:6]) + np.prod(box_b[3:6]) - inter
    return inter / max(union, 1e-6)


def _accumulate(pred_list, gt_by_token, class_name, dist_th):
    """One (class, threshold) accumulation over the whole dataset.

    pred_list: list of (score, token, box7) for this class, UNSORTED.
    Returns dict with tp/fp arrays (score-sorted), npos, and match errors.
    """
    npos = sum(
        int((gt["names"] == class_name).sum()) for gt in gt_by_token.values()
    )
    preds = sorted(pred_list, key=lambda e: -e[0])
    tp = np.zeros(len(preds))
    fp = np.zeros(len(preds))
    trans_err, scale_err, orient_err = [], [], []

    taken = {tok: set() for tok in gt_by_token}
    for i, (score, token, box) in enumerate(preds):
        gt = gt_by_token.get(token)
        best_dist, best_j = np.inf, -1
        if gt is not None:
            cls_mask = gt["names"] == class_name
            idxs = np.where(cls_mask)[0]
            for j in idxs:
                if j in taken[token]:
                    continue
                d = np.linalg.norm(gt["boxes"][j, :2] - box[:2])
                if d < best_dist:
                    best_dist, best_j = d, j
        if best_j >= 0 and best_dist < dist_th:
            taken[token].add(best_j)
            tp[i] = 1
            gt_box = gt_by_token[token]["boxes"][best_j]
            trans_err.append(best_dist)
            scale_err.append(1.0 - _aligned_iou3d(box, gt_box))
            orient_err.append(_yaw_diff(box[6], gt_box[6]))
        else:
            fp[i] = 1

    return {
        "tp": tp, "fp": fp, "npos": npos,
        "trans_err": np.asarray(trans_err),
        "scale_err": np.asarray(scale_err),
        "orient_err": np.asarray(orient_err),
    }


def _calc_ap(acc):
    """Official nuScenes calc_ap on the accumulated tp/fp."""
    npos = acc["npos"]
    if npos == 0:
        return np.nan
    tp_cum = np.cumsum(acc["tp"])
    fp_cum = np.cumsum(acc["fp"])
    if len(tp_cum) == 0:
        return 0.0
    recall = tp_cum / npos
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)

    rec_interp = np.linspace(0, 1, N_RECALL_PTS)
    prec_interp = np.interp(rec_interp, recall, precision, right=0)

    prec = prec_interp[round(100 * MIN_RECALL) + 1 :]
    prec = prec - MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec) / (1.0 - MIN_PRECISION))


def nuscenes_protocol_eval(det_annos, gt_by_token, class_names, output_path=None):
    """
    Args:
        det_annos: list of per-sample dicts with 'boxes_lidar' (N, 7+),
            'score' (N,), 'name' (N,), 'metadata' {'lidar_token': ...}.
        gt_by_token: {lidar_token: {'boxes': (M, 7), 'names': (M,)}}.
    Returns:
        (result_str, result_dict) like the reference dataset.evaluation.
    """
    preds_by_class = {c: [] for c in class_names}
    for anno in det_annos:
        token = anno["metadata"]["lidar_token"]
        for box, score, name in zip(anno["boxes_lidar"], anno["score"], anno["name"]):
            if name in preds_by_class:
                preds_by_class[name].append((float(score), token, np.asarray(box[:7])))

    result_dict = {}
    ap_values = []
    tp_scores = []
    lines = []
    for cls in class_names:
        cls_aps = {}
        tp_errs = None
        for th in DIST_THRESHOLDS:
            acc = _accumulate(preds_by_class[cls], gt_by_token, cls, th)
            ap = _calc_ap(acc)
            cls_aps[th] = ap
            if th == TP_THRESHOLD:
                tp_errs = {
                    "ATE": float(np.mean(acc["trans_err"])) if acc["trans_err"].size else 1.0,
                    "ASE": float(np.mean(acc["scale_err"])) if acc["scale_err"].size else 1.0,
                    "AOE": float(np.mean(acc["orient_err"])) if acc["orient_err"].size else 1.0,
                }
        mean_ap_cls = float(np.nanmean([v for v in cls_aps.values()]))
        result_dict[f"{cls}_AP"] = mean_ap_cls
        for th, v in cls_aps.items():
            result_dict[f"{cls}_AP_dist_{th}"] = v
        result_dict.update({f"{cls}_{k}": v for k, v in tp_errs.items()})
        ap_values.append(mean_ap_cls)
        tp_scores.extend(1.0 - min(1.0, v) for v in tp_errs.values())
        lines.append(
            f"{cls}: AP {mean_ap_cls * 100:.2f} "
            + " ".join(f"AP@{th} {cls_aps[th] * 100:.2f}" for th in DIST_THRESHOLDS)
            + " | " + " ".join(f"{k} {v:.3f}" for k, v in tp_errs.items())
        )

    mean_ap = float(np.nanmean(ap_values)) if ap_values else 0.0
    nds = (5.0 * mean_ap + sum(tp_scores)) / (5.0 + len(tp_scores)) if tp_scores else mean_ap
    result_dict["mAP"] = mean_ap
    result_dict["NDS"] = nds
    lines.append(f"mAP: {mean_ap * 100:.2f}  NDS: {nds * 100:.2f}")
    result_str = "\n".join(lines)

    if output_path is not None:
        out = Path(output_path)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "metrics_summary.json", "w") as f:
            json.dump(result_dict, f, indent=2)
    return result_str, result_dict
