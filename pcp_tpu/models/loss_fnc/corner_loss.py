"""Corner-distance regularization loss (jnp).

Behavioral counterpart of the reference `loss_utils.get_corner_loss_lidar`
(/root/reference/pcdet/utils/loss_utils.py): per-box mean over the 8 corner
distances, each taken as min(dist to GT corners, dist to yaw-flipped GT
corners), passed through a delta=1 Huber.
"""
import jax.numpy as jnp


def boxes_to_corners_3d_jnp(boxes):
    """(..., 7) -> (..., 8, 3); same corner order as utils.box_utils."""
    corners_norm = jnp.asarray(
        [
            [1, 1, -1], [-1, 1, -1], [-1, -1, -1], [1, -1, -1],
            [1, 1, 1], [-1, 1, 1], [-1, -1, 1], [1, -1, 1],
        ],
        dtype=boxes.dtype,
    ) / 2.0
    corners = boxes[..., None, 3:6] * corners_norm  # (..., 8, 3)
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1)
    rot = rot.reshape(rot.shape[:-1] + (3, 3))
    corners = jnp.einsum("...ij,...kj->...ki", rot, corners)
    return corners + boxes[..., None, 0:3]


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """pred/gt (..., 7) -> per-box corner loss (...,)."""
    pred_c = boxes_to_corners_3d_jnp(pred_boxes)
    gt_c = boxes_to_corners_3d_jnp(gt_boxes)
    gt_flip = jnp.concatenate(
        [gt_boxes[..., :6], gt_boxes[..., 6:7] + jnp.pi], axis=-1)
    gt_c_flip = boxes_to_corners_3d_jnp(gt_flip)
    d = jnp.minimum(
        jnp.linalg.norm(pred_c - gt_c, axis=-1),
        jnp.linalg.norm(pred_c - gt_c_flip, axis=-1),
    )  # (..., 8)
    # huber, delta = 1.0 (reference WeightedSmoothL1-style corner penalty)
    abs_d = jnp.abs(d)
    huber = jnp.where(abs_d < 1.0, 0.5 * abs_d ** 2, abs_d - 0.5)
    return jnp.mean(huber, axis=-1)
