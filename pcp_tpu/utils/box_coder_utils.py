"""Residual box coders for anchor heads, in JAX.

Capability match for /root/reference/pcdet/utils/box_coder_utils.py:5-117
(``ResidualCoder`` encode/decode, ``PreviousResidualDecoder``). Pure functions
over (..., 7 + C) arrays — no in-place clamping of the caller's arrays; the
dim floor is applied to local copies.
"""
import jax.numpy as jnp


class ResidualCoder:
    """Anchor-relative residual coding (reference box_coder_utils.py:5-88)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7 + C) -> (..., code_size)."""
        anchors_dim = jnp.clip(anchors[..., 3:6], min=1e-5)
        boxes_dim = jnp.clip(boxes[..., 3:6], min=1e-5)

        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors_dim[..., 0], anchors_dim[..., 1], anchors_dim[..., 2]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes_dim[..., 0], boxes_dim[..., 1], boxes_dim[..., 2]
        rg = boxes[..., 6]

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings: (..., code_size), anchors: (..., 7 + C) -> (..., 7 + C)."""
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza

        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(
                box_encodings[..., 7] + jnp.sin(ra), box_encodings[..., 6] + jnp.cos(ra)
            )
            extra_start = 8
        else:
            rg = box_encodings[..., 6] + ra
            extra_start = 7
        # zip semantics of the reference: extra channels only where both sides
        # have them (sincos pads anchors to 8 dims with no matching encoding)
        n_extra = min(anchors.shape[-1] - 7, box_encodings.shape[-1] - extra_start)
        cgs = [
            box_encodings[..., extra_start + i] + anchors[..., 7 + i] for i in range(n_extra)
        ]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    """Point-relative residual coding with per-class mean sizes
    (reference box_coder_utils.py:144-230). Heading is always sin/cos-coded
    (code_size = 8 + extras)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(kwargs["mean_size"], jnp.float32)
            assert float(self.mean_size.min()) > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+C), points (N, 3), gt_classes (N,) 1-based."""
        dims = jnp.clip(gt_boxes[..., 3:6], min=1e-5)
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg, dyg, dzg = dims[..., 0], dims[..., 1], dims[..., 2]
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]

        if self.use_mean_size:
            anchor = self.mean_size[jnp.clip(gt_classes - 1, 0)]
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xt, yt, zt = (xg - xa) / diagonal, (yg - ya) / diagonal, (zg - za) / dza
            dxt, dyt, dzt = jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        cts = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *cts], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        """box_encodings (N, 8+C), points (N, 3), pred_classes 1-based."""
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]

        if self.use_mean_size:
            anchor = self.mean_size[jnp.clip(pred_classes - 1, 0)]
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa**2 + dya**2)
            xg, yg, zg = xt * diagonal + xa, yt * diagonal + ya, zt * dza + za
            dxg, dyg, dzg = jnp.exp(dxt) * dxa, jnp.exp(dyt) * dya, jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        cgs = [box_encodings[..., 8 + i] for i in range(box_encodings.shape[-1] - 8)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PreviousResidualDecoder:
    """Legacy (w, l, h)-ordered decoder (reference box_coder_utils.py:91-126)."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        wt, lt, ht = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        rg = box_encodings[..., 6] + ra
        cgs = [box_encodings[..., 7 + i] + anchors[..., 7 + i] for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)
