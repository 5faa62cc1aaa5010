"""multi_classes_nms: per-class independent NMS over the shared box set
(reference model_nms_utils.py:28-66 semantics) + the detector post-processing
MULTI_CLASSES_NMS branch."""
import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.ops.nms import multi_classes_nms


def test_per_class_independent():
    # two overlapping boxes: class 0 prefers box A, class 1 prefers box B —
    # per-class NMS keeps the per-class winner independently
    boxes = jnp.asarray([[0.0, 0, 0, 4, 2, 1.6, 0.0],
                         [0.2, 0, 0, 4, 2, 1.6, 0.0],
                         [20.0, 0, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.2], [0.6, 0.8], [0.7, 0.0]], jnp.float32)
    cfg = {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 8, "NMS_POST_MAXSIZE": 4}
    out = multi_classes_nms(scores, boxes, jnp.ones(3, bool), cfg, score_thresh=0.1)
    b = np.asarray(out["pred_boxes"])[np.asarray(out["pred_valid"])]
    s = np.asarray(out["pred_scores"])[np.asarray(out["pred_valid"])]
    l = np.asarray(out["pred_labels"])[np.asarray(out["pred_valid"])]
    # class 0: box0 (0.9) suppresses box1; far box2 kept -> 2 dets
    # class 1: box1 (0.8) wins; box2 has score 0 (< thresh) -> 1 det
    assert sorted(l.tolist()) == [0, 0, 1]
    np.testing.assert_allclose(np.sort(s[l == 0]), [0.7, 0.9], atol=1e-6)
    np.testing.assert_allclose(s[l == 1], [0.8], atol=1e-6)
    np.testing.assert_allclose(b[l == 1][0, 0], 0.2, atol=1e-6)


def test_score_thresh_filters():
    boxes = jnp.asarray([[0.0, 0, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    scores = jnp.asarray([[0.05, 0.5]], jnp.float32)
    cfg = {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 4, "NMS_POST_MAXSIZE": 2}
    out = multi_classes_nms(scores, boxes, jnp.ones(1, bool), cfg, score_thresh=0.1)
    l = np.asarray(out["pred_labels"])[np.asarray(out["pred_valid"])]
    assert l.tolist() == [1]


def test_detector_multiclass_branch():
    """generic_post_processing with MULTI_CLASSES_NMS: 1-based labels out."""
    from pcp_tpu.models.detectors.pointpillar import generic_post_processing

    cfg = {"POST_PROCESSING": {
        "SCORE_THRESH": 0.1, "OUTPUT_RAW_SCORE": False,
        "NMS_CONFIG": {"MULTI_CLASSES_NMS": True, "NMS_TYPE": "nms_gpu",
                       "NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 8,
                       "NMS_POST_MAXSIZE": 4},
        "RECALL_THRESH_LIST": [0.3]}}
    batch = {
        "batch_cls_preds": jnp.asarray([[[3.0, -3.0], [-3.0, 2.0]]]),  # logits
        "batch_box_preds": jnp.asarray(
            [[[0.0, 0, 0, 4, 2, 1.6, 0.0], [10.0, 0, 0, 4, 2, 1.6, 0.0]]]),
        "cls_preds_normalized": False,
    }
    out = generic_post_processing(cfg, 2, batch)
    valid = np.asarray(out["pred_valid"][0])
    labels = np.asarray(out["pred_labels"][0])[valid]
    assert set(labels.tolist()) == {1, 2}  # 1-based
