"""Differential checks of ROI-head math against torch / numpy references:
- SECONDHead's rotated BEV grid sampling vs F.affine_grid + F.grid_sample
  (the reference's exact ops, torch CPU);
- canonical-frame GT transform vs a straight numpy port of
  roi_head_template.assign_targets :132-163."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pcp_tpu.models.roi_heads.roi_head_template import rotate_points_along_z_jnp
from pcp_tpu.models.roi_heads.second_head import bilinear_sample_zero_pad


class TestSecondHeadGridSample:
    def test_matches_torch_affine_grid(self):
        """Reproduce second_head.roi_grid_pool (:63-120) in torch and compare."""
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        b, h, w, c = 1, 24, 24, 5
        feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
        rois = np.array([[[2.0, -1.5, 0.0, 3.0, 1.6, 1.5, 0.7],
                          [-3.0, 2.0, 0.0, 4.0, 2.0, 1.5, -0.4]]], np.float32)
        min_x, min_y = -6.0, -6.0
        vx = vy = 0.5  # feature-map pixel = 0.5 m (voxel * downsample)
        g = 7

        # ---- torch reference path
        tf = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
        r = torch.from_numpy(rois[0])
        x1 = (r[:, 0] - r[:, 3] / 2 - min_x) / vx
        x2 = (r[:, 0] + r[:, 3] / 2 - min_x) / vx
        y1 = (r[:, 1] - r[:, 4] / 2 - min_y) / vy
        y2 = (r[:, 1] + r[:, 4] / 2 - min_y) / vy
        cosa, sina = torch.cos(r[:, 6]), torch.sin(r[:, 6])
        theta = torch.stack((
            (x2 - x1) / (w - 1) * cosa, (x2 - x1) / (w - 1) * (-sina),
            (x1 + x2 - w + 1) / (w - 1),
            (y2 - y1) / (h - 1) * sina, (y2 - y1) / (h - 1) * cosa,
            (y1 + y2 - h + 1) / (h - 1),
        ), dim=1).view(-1, 2, 3)
        grid = F.affine_grid(theta, torch.Size((2, c, g, g)), align_corners=True)
        expected = F.grid_sample(tf.expand(2, c, h, w), grid, align_corners=True)
        expected = expected.permute(0, 2, 3, 1).numpy()  # (R, g, g, C)

        # ---- our path (the direct theta expansion in SECONDHead.__call__)
        u = np.linspace(-1, 1, g)
        uu, vv = np.meshgrid(u, u, indexing="xy")
        uu, vv = uu.reshape(-1), vv.reshape(-1)
        cx = (rois[0, :, 0] - min_x) / vx
        cy = (rois[0, :, 1] - min_y) / vy
        hx = rois[0, :, 3] / (2 * vx)
        hy = rois[0, :, 4] / (2 * vy)
        ca, sa = np.cos(rois[0, :, 6]), np.sin(rois[0, :, 6])
        px = cx[:, None] + hx[:, None] * uu * ca[:, None] - hx[:, None] * vv * sa[:, None]
        py = cy[:, None] + hy[:, None] * uu * sa[:, None] + hy[:, None] * vv * ca[:, None]
        got = bilinear_sample_zero_pad(
            jnp.asarray(feat), jnp.asarray(px.reshape(1, -1), jnp.float32),
            jnp.asarray(py.reshape(1, -1), jnp.float32))
        got = np.asarray(got).reshape(2, g, g, c)
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestCanonicalTransform:
    def test_matches_numpy_reference(self):
        """assign_targets' canonical GT transform vs numpy port (:140-160)."""
        from pcp_tpu.models.roi_heads.roi_head_template import assign_targets
        import jax

        rng = np.random.default_rng(1)
        rois = rng.uniform(-5, 5, (1, 8, 7)).astype(np.float32)
        rois[..., 3:6] = rng.uniform(1, 4, (1, 8, 3))
        gt = np.zeros((1, 3, 8), np.float32)
        gt[0, 0] = [1.0, 0.5, -0.5, 3.9, 1.6, 1.5, 0.4, 1]
        gt[0, 1] = [-2.0, 3.0, 0.0, 4.2, 1.9, 1.7, 2.4, 1]
        batch = {
            "rois": jnp.asarray(rois),
            "roi_scores": jnp.ones((1, 8)),
            "roi_labels": jnp.ones((1, 8), jnp.int32),
            "gt_boxes": jnp.asarray(gt),
        }
        cfg = {"ROI_PER_IMAGE": 8, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
               "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
               "HARD_BG_RATIO": 0.8, "CLS_SCORE_TYPE": "cls"}
        t = assign_targets(jax.random.PRNGKey(0), batch, cfg)
        rois_s = np.asarray(t["rois"])[0]
        gt_src = np.asarray(t["gt_of_rois_src"])[0]
        gt_ct = np.asarray(t["gt_of_rois"])[0]

        for i in range(8):
            ref = gt_src[i].copy()
            roi = rois_s[i]
            ry = roi[6] % (2 * np.pi)
            shifted = ref[:3] - roi[:3]
            c, s = np.cos(-ry), np.sin(-ry)
            local = np.array([c * shifted[0] - s * shifted[1],
                              s * shifted[0] + c * shifted[1], shifted[2]])
            heading = (ref[6] - ry) % (2 * np.pi)
            if np.pi * 0.5 < heading < np.pi * 1.5:
                heading = (heading + np.pi) % (2 * np.pi)
            if heading > np.pi:
                heading -= 2 * np.pi
            heading = np.clip(heading, -np.pi / 2, np.pi / 2)
            np.testing.assert_allclose(gt_ct[i, :3], local, atol=1e-4)
            np.testing.assert_allclose(gt_ct[i, 3:6], ref[3:6], atol=1e-5)
            np.testing.assert_allclose(gt_ct[i, 6], heading, atol=1e-4)


class TestGeneratePredictedBoxes:
    def test_matches_reference_decode(self):
        """RoIHeadTemplate.generate_predicted_boxes vs a numpy port of the
        reference (pcdet roi_head_template.py:262-285): local_rois keeps the
        ROI yaw (only xyz zeroed), so the decoded heading is rt + roi_ry."""
        from pcp_tpu.models.roi_heads.roi_head_template import RoIHeadTemplate

        rng = np.random.default_rng(7)
        b, m = 2, 6
        rois = rng.uniform(-10, 10, (b, m, 7)).astype(np.float32)
        rois[..., 3:6] = rng.uniform(1, 4, (b, m, 3))
        rois[..., 6] = rng.uniform(-np.pi, np.pi, (b, m))
        box_preds = (rng.normal(size=(b, m, 7)) * 0.2).astype(np.float32)
        cls_preds = rng.normal(size=(b, m, 1)).astype(np.float32)

        head = RoIHeadTemplate(
            model_cfg={"TARGET_CONFIG": {"BOX_CODER": "ResidualCoder"}},
            num_class=1)
        _, got = head.generate_predicted_boxes(
            jnp.asarray(rois), jnp.asarray(cls_preds), jnp.asarray(box_preds))
        got = np.asarray(got)

        # numpy port of decode_torch + rotate_points_along_z + xyz shift
        xt, yt, zt, dxt, dyt, dzt, rt = np.split(box_preds, 7, axis=-1)
        xa = np.zeros_like(xt); ya = np.zeros_like(yt); za = np.zeros_like(zt)
        dxa, dya, dza = (rois[..., 3:4], rois[..., 4:5], rois[..., 5:6])
        ra = rois[..., 6:7]
        diag = np.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa; yg = yt * diag + ya; zg = zt * dza + za
        dxg = np.exp(dxt) * dxa; dyg = np.exp(dyt) * dya; dzg = np.exp(dzt) * dza
        rg = rt + ra
        dec = np.concatenate([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        ry = rois[..., 6]
        c, s = np.cos(ry), np.sin(ry)
        xr = dec[..., 0] * c - dec[..., 1] * s
        yr = dec[..., 0] * s + dec[..., 1] * c
        expected = dec.copy()
        expected[..., 0] = xr + rois[..., 0]
        expected[..., 1] = yr + rois[..., 1]
        expected[..., 2] = dec[..., 2] + rois[..., 2]
        np.testing.assert_allclose(got, expected, atol=1e-4)
