"""Anchor-head family tests: generator, coder, assigner, PointPillar E2E."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.models.dense_heads.anchor_head_single import (
    boxes3d_nearest_bev_iou,
    generate_anchors,
    limit_period,
)
from pcp_tpu.utils.box_coder_utils import ResidualCoder


PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 1.0)


def _anchor_cfg(**kw):
    cfg = {
        "class_name": "car",
        "anchor_sizes": [[4.2, 1.8, 1.6]],
        "anchor_rotations": [0, 1.57],
        "anchor_bottom_heights": [-1.78],
        "align_center": False,
        "feature_map_stride": 2,
        "matched_threshold": 0.55,
        "unmatched_threshold": 0.4,
    }
    cfg.update(kw)
    return cfg


class TestAnchorGenerator:
    def test_grid_layout(self):
        anchors, n_loc = generate_anchors([_anchor_cfg()], (8, 8, 1), PC_RANGE)
        assert anchors.shape == (4, 4, 2, 7)
        assert n_loc == [2]
        # unaligned: first anchor at the range min, last at range max
        assert anchors[0, 0, 0, 0] == pytest.approx(PC_RANGE[0])
        assert anchors[0, 0, 0, 1] == pytest.approx(PC_RANGE[1])
        assert anchors[-1, -1, 0, 0] == pytest.approx(PC_RANGE[3])
        # z is shifted from bottom to center (ref anchor_generator.py:58)
        assert anchors[0, 0, 0, 2] == pytest.approx(-1.78 + 1.6 / 2)
        # per-location rotation ordering
        assert anchors[0, 0, 0, 6] == pytest.approx(0.0)
        assert anchors[0, 0, 1, 6] == pytest.approx(1.57)
        # y-major layout: anchors[y, x]
        assert anchors[1, 0, 0, 1] != anchors[0, 0, 0, 1]
        assert anchors[1, 0, 0, 0] == anchors[0, 0, 0, 0]

    def test_two_class_sets_concat_per_location(self):
        cfgs = [_anchor_cfg(), _anchor_cfg(class_name="ped", anchor_sizes=[[0.8, 0.6, 1.7]])]
        anchors, n_loc = generate_anchors(cfgs, (8, 8, 1), PC_RANGE)
        assert anchors.shape == (4, 4, 4, 7)
        assert n_loc == [2, 2]
        assert anchors[0, 0, 0, 3] == pytest.approx(4.2)
        assert anchors[0, 0, 2, 3] == pytest.approx(0.8)

    def test_align_center(self):
        anchors, _ = generate_anchors([_anchor_cfg(align_center=True)], (8, 8, 1), PC_RANGE)
        stride = (PC_RANGE[3] - PC_RANGE[0]) / 4
        assert anchors[0, 0, 0, 0] == pytest.approx(PC_RANGE[0] + stride / 2)


class TestResidualCoder:
    def test_roundtrip(self, rng):
        coder = ResidualCoder()
        boxes = np.zeros((16, 7), dtype=np.float32)
        boxes[:, 0:3] = rng.uniform(-5, 5, (16, 3))
        boxes[:, 3:6] = rng.uniform(1, 4, (16, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, 16)
        anchors = boxes + rng.normal(0, 0.3, boxes.shape).astype(np.float32)
        anchors[:, 3:6] = np.abs(anchors[:, 3:6]) + 0.5
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
        dec = coder.decode(enc, jnp.asarray(anchors))
        np.testing.assert_allclose(np.asarray(dec), boxes, rtol=1e-4, atol=1e-4)

    def test_known_values(self):
        coder = ResidualCoder()
        box = jnp.asarray([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.3]])
        anchor = jnp.asarray([[0.0, 0.0, 0.0, 3.0, 4.0, 2.0, 0.0]])
        enc = np.asarray(coder.encode(box, anchor))[0]
        diag = np.sqrt(9.0 + 16.0)
        assert enc[0] == pytest.approx(1.0 / diag)
        assert enc[1] == pytest.approx(2.0 / diag)
        assert enc[2] == pytest.approx(0.5 / 2.0)
        assert enc[3] == pytest.approx(np.log(4.0 / 3.0), rel=1e-5)
        assert enc[6] == pytest.approx(0.3)

    def test_sincos_roundtrip(self, rng):
        coder = ResidualCoder(encode_angle_by_sincos=True)
        assert coder.code_size == 8
        boxes = np.zeros((4, 7), dtype=np.float32)
        boxes[:, 3:6] = 2.0
        boxes[:, 6] = rng.uniform(-1.2, 1.2, 4)
        anchors = np.array(boxes)
        anchors[:, 6] = 0.0
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
        dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
        np.testing.assert_allclose(dec[:, 6], boxes[:, 6], atol=1e-5)


class TestNearestBevIoU:
    def test_axis_aligned(self):
        a = jnp.asarray([[0.0, 0, 0, 4, 2, 1, 0]])
        b = jnp.asarray([[2.0, 0, 0, 4, 2, 1, 0]])
        got = float(boxes3d_nearest_bev_iou(a, b)[0, 0])
        assert got == pytest.approx(4.0 / 12.0, abs=1e-5)

    def test_rotation_snaps_dims(self):
        # a box rotated ~90deg swaps dx/dy in the aligned approximation
        a = jnp.asarray([[0.0, 0, 0, 4, 2, 1, 0]])
        b = jnp.asarray([[0.0, 0, 0, 2, 4, 1, np.pi / 2]])
        got = float(boxes3d_nearest_bev_iou(a, b)[0, 0])
        assert got == pytest.approx(1.0, abs=1e-5)


def _np_assign_reference(anchors, gt, gt_cls, class_id, matched, unmatched):
    """Independent per-anchor loop implementing the published greedy-assign
    semantics (axis_aligned_target_assigner.py:134-210) for differential
    testing of the vectorized version."""
    sel = [i for i in range(len(gt)) if gt_cls[i] == class_id and np.any(gt[i, :7] != 0)]
    na = len(anchors)
    labels = -np.ones(na, dtype=np.int64)
    if not sel:
        return np.zeros(na, dtype=np.int64), None
    iou = np.asarray(boxes3d_nearest_bev_iou(jnp.asarray(anchors[:, :7]), jnp.asarray(gt[sel, :7])))
    a2g = iou.argmax(1)
    a2g_max = iou.max(1)
    g2a_max = iou.max(0)
    pos = a2g_max >= matched
    bg = a2g_max < unmatched
    force = np.zeros(na, dtype=bool)
    for j in range(len(sel)):
        if g2a_max[j] > 0:
            force |= iou[:, j] == g2a_max[j]
    labels[pos] = class_id
    labels[bg] = 0
    labels[force] = class_id
    return labels, a2g


class TestTargetAssigner:
    def _head(self):
        from pcp_tpu.models.dense_heads.anchor_head_single import AnchorHeadSingle

        cfg = {
            "ANCHOR_GENERATOR_CONFIG": [_anchor_cfg()],
            "TARGET_ASSIGNER_CONFIG": {
                "NAME": "AxisAlignedTargetAssigner",
                "POS_FRACTION": -1.0,
                "SAMPLE_SIZE": 512,
                "NORM_BY_NUM_EXAMPLES": False,
                "MATCH_HEIGHT": False,
                "BOX_CODER": "ResidualCoder",
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7}},
            "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0,
            "NUM_DIR_BINS": 2,
        }
        return AnchorHeadSingle(
            model_cfg=cfg, input_channels=32, num_class=1, class_names=("car",),
            grid_size=(8, 8, 1), point_cloud_range=PC_RANGE,
        )

    def test_matches_loop_reference(self, rng):
        head = self._head()
        gt = np.zeros((2, 6, 8), dtype=np.float32)
        for b in range(2):
            n = 3 + b
            gt[b, :n, 0:2] = rng.uniform(-6, 6, (n, 2))
            gt[b, :n, 2] = -1.0
            gt[b, :n, 3:6] = [4.2, 1.8, 1.6]
            gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
            gt[b, :n, 7] = 1.0

        batch = {"spatial_features_2d": jnp.zeros((2, 4, 4, 32)), "gt_boxes": jnp.asarray(gt)}
        variables = head.init(jax.random.PRNGKey(0), batch, train=True)
        out = head.apply(variables, batch, train=True)
        tgt = jax.tree_util.tree_map(np.asarray, out["head_targets"])

        anchors = head.bind(variables).anchors_grid.reshape(-1, 7)
        for b in range(2):
            want, _ = _np_assign_reference(
                anchors, gt[b], gt[b, :, 7].astype(int), 1, 0.55, 0.4
            )
            got = tgt["box_cls_labels"][b]
            np.testing.assert_array_equal(got, want)
        # reg targets: zero on non-fg, encoded gt on fg
        fg = tgt["box_cls_labels"] > 0
        assert tgt["box_reg_targets"][~fg].sum() == 0
        assert fg.sum() > 0
        np.testing.assert_array_equal(tgt["reg_weights"], fg.astype(np.float32))

    def test_no_gt_all_background(self):
        head = self._head()
        gt = np.zeros((1, 4, 8), dtype=np.float32)
        batch = {"spatial_features_2d": jnp.zeros((1, 4, 4, 32)), "gt_boxes": jnp.asarray(gt)}
        variables = head.init(jax.random.PRNGKey(0), batch, train=True)
        out = head.apply(variables, batch, train=True)
        labels = np.asarray(out["head_targets"]["box_cls_labels"])
        assert (labels == 0).all()


class TestPointPillarE2E:
    @pytest.fixture(scope="class")
    def built(self):
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network
        from pcp_tpu.models.detectors.detector_template import DatasetInfo

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_anchor_car.yaml", cfg)
        info = DatasetInfo(
            class_names=("car",), num_point_features=5,
            point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
            voxel_size=(0.2, 0.2, 8.0), grid_size=(128, 128, 1),
        )
        model = build_network(cfg.MODEL, num_class=1, dataset_info=info)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-12, 12, (2, 512, 5)).astype(np.float32)
        gt = np.zeros((2, 4, 8), dtype=np.float32)
        gt[:, :2, 0:2] = rng.uniform(-8, 8, (2, 2, 2))
        gt[:, :2, 2] = -1.0
        gt[:, :2, 3:6] = [4.2, 1.8, 1.6]
        gt[:, :2, 7] = 1.0
        batch = {
            "points": jnp.asarray(pts),
            "points_mask": jnp.ones((2, 512), bool),
            "gt_boxes": jnp.asarray(gt),
            "batch_size": 2,
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        return model, variables, batch

    def test_train_loss_finite_and_grads_flow(self, built):
        model, variables, batch = built
        params, bstats = variables["params"], variables.get("batch_stats", {})

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bstats}, batch, train=True,
                mutable=["batch_stats"],
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gnorm = jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads))
        )
        assert float(gnorm) > 0

    def test_eval_outputs_fixed_shape(self, built):
        model, variables, batch = built
        out = model.apply(variables, batch, train=False)
        fbd = out["final_box_dicts"]
        assert fbd["pred_boxes"].shape == (2, 500, 7)
        assert fbd["pred_scores"].shape == (2, 500)
        assert fbd["pred_labels"].shape == (2, 500)
        assert bool(jnp.all(fbd["pred_scores"] >= 0))
        # labels are 1-based where valid
        lab = np.asarray(fbd["pred_labels"])[np.asarray(fbd["pred_valid"])]
        assert (lab >= 1).all()
