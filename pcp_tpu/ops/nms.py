"""Fixed-shape greedy NMS for rotated BEV boxes, in pure JAX.

TPU-native replacement for the reference ``nms_gpu`` / ``nms_normal_gpu``
(/root/reference/pcdet/ops/iou3d_nms/iou3d_nms_utils.py:84-116, kernel in
iou3d_nms_kernel.cu). The CUDA version runs a 64-bit-bitmask blockwise greedy
suppression over a score-sorted list and returns a variable-length index list;
under XLA we keep everything statically shaped:

  * boxes are score-sorted (invalid entries get -inf scores and sort last),
  * one (K, K) rotated-IoU matrix is computed up front (MXU/VPU friendly),
  * Jacobi fixed-point sweeps resolve the greedy recurrence (see
    ``_greedy_suppress``),
  * the result is a fixed-size keep mask + the indices of kept boxes padded to
    ``post_max_size``.

Greedy semantics match the CUDA kernel exactly: a box is kept iff no
higher-scoring *kept* box overlaps it above the threshold.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev, boxes_iou_normal


def _greedy_suppress(iou, valid, thresh):
    """iou: (K, K); valid: (K,) bool, in score-sorted order. Returns keep mask (K,).

    Exact greedy semantics (a box is kept iff no higher-scoring kept box
    overlaps it above the threshold) computed by Jacobi fixed-point iteration
    instead of a K-step sequential loop: the recurrence
    ``keep_i = valid_i & not any(keep_j & over[i, j] for j < i)`` only depends
    on lower indices, so after t sweeps every box whose suppression-chain
    depth is < t holds its final value, and the unique fixed point IS the
    greedy solution. Chains are short in practice (< ~10), so this converges
    in a handful of O(K^2) vectorized sweeps — far cheaper on TPU than K
    sequential fori_loop steps of scalar work.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    # over[i, j]: valid j (j < i in score order) overlaps i above threshold
    over = (iou > thresh) & (idx[None, :] < idx[:, None]) & valid[None, :]

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        new_keep = valid & ~jnp.any(over & keep[None, :], axis=1)
        return new_keep, jnp.any(new_keep != keep)

    keep0 = valid
    keep1 = valid & ~jnp.any(over & keep0[None, :], axis=1)
    keep, _ = jax.lax.while_loop(cond, body, (keep1, jnp.any(keep1 != keep0)))
    return keep


@partial(jax.jit, static_argnames=("post_max_size", "normal"))
def nms_bev(boxes, scores, valid_mask, thresh, post_max_size=83, normal=False):
    """Greedy rotated-BEV NMS over a fixed-capacity box buffer.

    Args:
        boxes: (K, 7) — may contain padding rows.
        scores: (K,) — scores for sorting.
        valid_mask: (K,) bool — False rows are padding and never kept.
        thresh: IoU threshold.
        post_max_size: number of kept indices to return (padded with -1).
        normal: use axis-aligned IoU (``nms_normal_gpu`` semantics).

    Returns:
        keep_idx: (post_max_size,) int32 indices into the *input* order,
            -1 for padding.
        keep_count: scalar int32, number of valid entries in keep_idx.
    """
    neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
    sort_scores = jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-sort_scores)
    boxes_s = boxes[order]
    valid_s = valid_mask[order]

    iou_fn = boxes_iou_normal if normal else boxes_iou_bev
    iou = iou_fn(boxes_s, boxes_s)
    keep = _greedy_suppress(iou, valid_s, thresh)

    # compact kept indices to the front, preserving score order
    kept_rank = jnp.cumsum(keep) - 1  # rank among kept, valid only where keep
    src_idx = order  # sorted position -> original index
    out = jnp.full((post_max_size,), -1, dtype=jnp.int32)
    scatter_pos = jnp.where(keep, kept_rank, post_max_size)  # overflow rows dropped
    out = out.at[jnp.clip(scatter_pos, 0, post_max_size)].set(
        src_idx.astype(jnp.int32), mode="drop"
    )
    keep_count = jnp.minimum(jnp.sum(keep), post_max_size).astype(jnp.int32)
    return out, keep_count


@partial(jax.jit, static_argnames=("post_max_size",))
def nms_bev_mask(boxes, scores, valid_mask, thresh, post_max_size=83):
    """Like :func:`nms_bev` but returns a keep *mask* aligned with the input
    order (True for at most the ``post_max_size`` highest-scoring survivors)."""
    keep_idx, _ = nms_bev(boxes, scores, valid_mask, thresh, post_max_size=post_max_size)
    mask = jnp.zeros((boxes.shape[0],), dtype=bool)
    # padding rows (-1) are routed to an out-of-bounds index and dropped, so
    # they can never clobber the entry for input index 0
    safe_idx = jnp.where(keep_idx >= 0, keep_idx, boxes.shape[0])
    mask = mask.at[safe_idx].set(True, mode="drop")
    return mask


@partial(jax.jit, static_argnames=("post_max_size",))
def nms_circle(boxes, scores, valid_mask, dist_thresh, post_max_size=83):
    """Greedy circle NMS (CenterPoint ``circle_nms``: suppress a detection
    whose squared center distance to a higher-scoring kept one is below
    ``dist_thresh``). Same fixed-point greedy machinery as :func:`nms_bev`
    with the pairwise criterion swapped to -dist^2 > -thresh."""
    neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
    order = jnp.argsort(-jnp.where(valid_mask, scores, neg_inf))
    boxes_s = boxes[order]
    valid_s = valid_mask[order]
    d2 = jnp.sum(
        (boxes_s[:, None, :2] - boxes_s[None, :, :2]) ** 2, axis=-1)
    keep = _greedy_suppress(-d2, valid_s, -dist_thresh)
    kept_rank = jnp.cumsum(keep) - 1
    out = jnp.full((post_max_size,), -1, dtype=jnp.int32)
    scatter_pos = jnp.where(keep, kept_rank, post_max_size)
    out = out.at[jnp.clip(scatter_pos, 0, post_max_size)].set(
        order.astype(jnp.int32), mode="drop")
    keep_count = jnp.minimum(jnp.sum(keep), post_max_size).astype(jnp.int32)
    return out, keep_count


def class_agnostic_nms(boxes, scores, valid_mask, nms_cfg, score_thresh=None):
    """Config-driven class-agnostic NMS mirroring the reference
    ``model_nms_utils.class_agnostic_nms`` (model_nms_utils.py:6-25): optional
    score threshold, top-k pre-selection, rotated NMS, post-max cap — but with
    static shapes (selection returned as index buffer + count).

    Args:
        boxes: (K, 7+), scores: (K,), valid_mask: (K,) bool.
        nms_cfg: dict-like with NMS_THRESH / NMS_PRE_MAXSIZE / NMS_POST_MAXSIZE
            / NMS_TYPE.
    Returns:
        keep_idx: (NMS_POST_MAXSIZE,) indices into input order (-1 pad),
        keep_count: scalar int32.
    """
    if score_thresh is not None:
        valid_mask = valid_mask & (scores >= score_thresh)

    pre_max = int(nms_cfg["NMS_PRE_MAXSIZE"])
    post_max = int(nms_cfg["NMS_POST_MAXSIZE"])
    nms_type = str(nms_cfg.get("NMS_TYPE", "nms_gpu"))
    normal = nms_type == "nms_normal_gpu"

    if nms_type == "circle_nms":
        # reference centernet_utils.circle_nms decode path: the threshold is
        # the squared center-distance radius (config MIN_RADIUS)
        return nms_circle(boxes[:, :7], scores, valid_mask,
                          float(nms_cfg["NMS_THRESH"]), post_max_size=post_max)

    # optional implementation cap on the quadratic (K, K) IoU matrix.
    # Default 0 = exact reference semantics (full NMS_PRE_MAXSIZE candidate
    # set); with the edge-clip IoU + fixed-point greedy sweep, exact NMS at
    # k=500 measures FASTER than a capped top-256 pass (the cap's extra
    # top-k gather costs more than the smaller matrix saves).
    impl_cap = int(nms_cfg.get("NMS_IMPL_MAX_CANDIDATES", 0))
    if impl_cap > 0:
        pre_max = min(pre_max, impl_cap)

    k = boxes.shape[0]
    if k > pre_max:
        neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
        order = jnp.argsort(-jnp.where(valid_mask, scores, neg_inf))[:pre_max]
        keep_idx, keep_count = nms_bev(
            boxes[order][:, :7], scores[order], valid_mask[order],
            float(nms_cfg["NMS_THRESH"]), post_max_size=post_max, normal=normal,
        )
        keep_idx = jnp.where(keep_idx >= 0, order[jnp.clip(keep_idx, 0)], -1).astype(jnp.int32)
        return keep_idx, keep_count
    return nms_bev(
        boxes[:, :7], scores, valid_mask,
        float(nms_cfg["NMS_THRESH"]), post_max_size=post_max, normal=normal,
    )


def multi_classes_nms(cls_scores, boxes, valid_mask, nms_cfg, score_thresh=None):
    """Per-class NMS with fixed output capacity, mirroring the reference
    ``model_nms_utils.multi_classes_nms`` (model_nms_utils.py:28-66): each
    class runs an independent class_agnostic_nms over the shared box set.

    Args:
        cls_scores: (K, num_class), boxes: (K, 7+C), valid_mask: (K,) bool.
    Returns:
        dict with pred_boxes (num_class*POST, 7+C), pred_scores, pred_labels
        (0-based class index, as in the reference), pred_valid.
    """
    num_class = cls_scores.shape[1]
    out_boxes, out_scores, out_labels, out_valid = [], [], [], []
    for k in range(num_class):
        sk = cls_scores[:, k]
        keep_idx, _ = class_agnostic_nms(boxes, sk, valid_mask, nms_cfg, score_thresh=score_thresh)
        sel = jnp.clip(keep_idx, 0)
        ok = keep_idx >= 0
        out_boxes.append(boxes[sel])
        out_scores.append(jnp.where(ok, sk[sel], 0.0))
        out_labels.append(jnp.full(keep_idx.shape, k, dtype=jnp.int32))
        out_valid.append(ok)
    return {
        "pred_boxes": jnp.concatenate(out_boxes, axis=0),
        "pred_scores": jnp.concatenate(out_scores, axis=0),
        "pred_labels": jnp.concatenate(out_labels, axis=0),
        "pred_valid": jnp.concatenate(out_valid, axis=0),
    }
