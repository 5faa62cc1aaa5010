"""Evaluation loop.

Counterpart of /root/reference/tools/eval_utils/eval_utils.py:22-136: batches ->
model -> ``generate_prediction_dicts`` -> recall statistics -> dataset
evaluation (native nuScenes-protocol mAP). Also hosts the exchange-database
writer consuming the device outputs (the reference writes from inside the
model forward; functional JAX modules return the arrays instead).
"""
import time

import jax
import numpy as np

from ..ops.rotated_iou import boxes_iou3d
from .train_utils import AverageMeter, _to_device_batch


def _recall_counts(pred_boxes, pred_valid, gt_boxes, thresh_list):
    """Recall of gt by predicted boxes at 3D-IoU thresholds (reference
    detector3d_template.py:347-389 semantics, batched + masked)."""
    import jax.numpy as jnp

    gt_valid = jnp.any(gt_boxes[..., :7] != 0, axis=-1)

    def one(pb, pv, gb, gv):
        iou = boxes_iou3d(gb[:, :7], pb[:, :7])  # (G, P)
        iou = jnp.where(pv[None, :], iou, 0.0)
        best = jnp.max(iou, axis=1)  # (G,)
        out = [jnp.sum(gv)]
        for th in thresh_list:
            out.append(jnp.sum((best > th) & gv))
        return jnp.stack(out)

    return jnp.sum(jax.vmap(one)(pred_boxes, pred_valid, gt_boxes, gt_valid), axis=0)


def eval_one_epoch(model, variables, dataset, dataloader, class_names, logger=None,
                   recall_thresh_list=(0.3, 0.5, 0.7), output_path=None,
                   exchange_writer=None, compute_recall=True, infer_time=False):
    """Returns (result_str, result_dict, det_annos).

    infer_time: measure device-synced per-batch inference latency (the
    reference's --infer_time + CUDA_LAUNCH_BLOCKING, eval_utils.py:40-73);
    sync is a host transfer of one output scalar, warmup batches excluded.
    """
    import jax.numpy as jnp

    host_model = getattr(model, "is_host_model", False)

    if not host_model:

        @jax.jit
        def fwd(variables, batch):
            out = model.apply(variables, batch, train=False)
            keep = {"final_box_dicts": out["final_box_dicts"]}
            for k in ("points_cls_prob", "points_flow3d"):
                if k in out:
                    keep[k] = out[k]
            return keep

    det_annos = []
    recall_acc = np.zeros(1 + len(recall_thresh_list))
    t0 = time.time()
    n_samples = 0
    infer_meter = AverageMeter() if infer_time else None
    warmup = 2
    for i_batch, batch in enumerate(dataloader):
        if host_model:
            out = model(batch)
            dev_batch = batch
        else:
            dev_batch = _to_device_batch(batch)
            if infer_time:
                t_inf = time.time()
                out = fwd(variables, dev_batch)
                # device sync: pull one scalar to host (block_until_ready can
                # return early behind the async device tunnel)
                _ = np.asarray(out["final_box_dicts"]["pred_scores"].sum())
                if i_batch >= warmup:
                    infer_meter.update(time.time() - t_inf)
            else:
                out = fwd(variables, dev_batch)
        fbd = {k: np.asarray(v) for k, v in out["final_box_dicts"].items()}
        annos = dataset.generate_prediction_dicts(batch, fbd, class_names)
        det_annos.extend(annos)
        n_samples += len(annos)

        if compute_recall and "gt_boxes" in dev_batch:
            recall_acc += np.asarray(
                _recall_counts(
                    jnp.asarray(fbd["pred_boxes"]),
                    jnp.asarray(fbd["pred_valid"]),
                    dev_batch["gt_boxes"],
                    list(recall_thresh_list),
                )
            )

        if exchange_writer is not None:
            exchange_writer(batch, out)

    sec_per_example = (time.time() - t0) / max(n_samples, 1)
    if logger is not None:
        logger.info(f"eval: {n_samples} samples, {sec_per_example:.4f} s/sample")
        if infer_meter is not None and infer_meter.count:
            logger.info(f"infer_time: {infer_meter.avg * 1e3:.1f} ms/batch (synced, {int(infer_meter.count)} batches)")

    result_dict = {}
    num_gt = max(recall_acc[0], 1)
    for i, th in enumerate(recall_thresh_list):
        result_dict[f"recall/rcnn_{th}"] = recall_acc[1 + i] / num_gt

    result_str, metrics = dataset.evaluation(
        det_annos, class_names, eval_metric="nuscenes", output_path=output_path
    )
    result_dict.update(metrics)
    result_dict["sec_per_example"] = sec_per_example
    if infer_meter is not None and infer_meter.count:
        result_dict["infer_time_ms_per_batch"] = infer_meter.avg * 1e3
    return result_str, result_dict, det_annos


def make_exchange_writer(exchange_db, bg_prob_thresh=0.3):
    """Host-side writer reproducing the in-forward dumps of the reference
    (center_head.py:409-427 MoDAR; hunter_jr.py:377-397 foreground)."""

    def writer(batch, out):
        from ..exchange.database import pool_box_flow

        fbd = {k: np.asarray(v) for k, v in out["final_box_dicts"].items()}
        points = np.asarray(batch["points"])
        pmask = np.asarray(batch["points_mask"])
        cls_prob = np.asarray(out["points_cls_prob"]) if "points_cls_prob" in out else None
        flow = np.asarray(out["points_flow3d"]) if "points_flow3d" in out else None

        for i, meta in enumerate(batch["metadata"]):
            token, lid = meta["sample_token"], int(meta["lidar_id"])
            valid = fbd["pred_valid"][i]
            modar = None
            if valid.any():
                modar = np.concatenate(
                    [
                        fbd["pred_boxes"][i][valid][:, :7],
                        fbd["pred_scores"][i][valid][:, None],
                        fbd["pred_labels"][i][valid][:, None].astype(np.float32),
                    ],
                    axis=1,
                )
                exchange_db.save_modar(token, lid, modar)
            fg = None
            if cls_prob is not None:
                send = (cls_prob[i][:, 0] < bg_prob_thresh) & pmask[i]
                if send.any():
                    fg = np.concatenate(
                        [points[i][send][:, :7], cls_prob[i][send], flow[i][send]], axis=1
                    )
                    exchange_db.save_foreground(token, lid, fg)
            if modar is not None:
                # bandwidth-optimal broadcast: sender pools its foreground
                # flow per box (12 floats/box ~= late-fusion bandwidth);
                # readers prefer this over receiver-side pooling
                exchange_db.save_boxflow(token, lid, pool_box_flow(modar, fg))

    return writer
