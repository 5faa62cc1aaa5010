"""Points-in-rotated-boxes tests in pure JAX.

TPU-native replacement for the reference CUDA extension ``roiaware_pool3d_cuda``
(/root/reference/pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:23-36
``check_pt_in_box3d``: z test against the *center* z with half-extent dz/2, xy
test in the box frame with a 1e-5 margin). The (N_pts, N_box) broadcast is a
natural fit for the VPU; no kernel needed.
"""
from functools import partial

import jax
import jax.numpy as jnp

MARGIN = 1e-5


def points_in_boxes_mask(points, boxes):
    """Containment mask.

    Args:
        points: (N, 3+) xyz[...]
        boxes: (M, 7) [x, y, z(center), dx, dy, dz, heading]
    Returns:
        (N, M) bool, True where point n is inside box m.
    """
    xyz = points[:, :3]
    rel = xyz[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    c = jnp.cos(boxes[:, 6])[None, :]
    s = jnp.sin(boxes[:, 6])[None, :]
    local_x = c * rel[..., 0] + s * rel[..., 1]
    local_y = -s * rel[..., 0] + c * rel[..., 1]
    in_z = jnp.abs(rel[..., 2]) <= boxes[None, :, 5] * 0.5
    in_x = jnp.abs(local_x) < boxes[None, :, 3] * 0.5 + MARGIN
    in_y = jnp.abs(local_y) < boxes[None, :, 4] * 0.5 + MARGIN
    return in_z & in_x & in_y


def points_in_boxes(points, boxes, boxes_valid=None):
    """Index of the first containing box per point, -1 when none — semantics
    of the reference ``points_in_boxes_gpu`` (roiaware_pool3d_utils.py:9-23).

    Args:
        points: (N, 3+), boxes: (M, 7), boxes_valid: optional (M,) bool.
    Returns:
        (N,) int32 box index or -1.
    """
    mask = points_in_boxes_mask(points, boxes)
    if boxes_valid is not None:
        mask = mask & boxes_valid[None, :]
    m = boxes.shape[0]
    first = jnp.argmax(mask, axis=1)  # first True (argmax on bool)
    any_hit = jnp.any(mask, axis=1)
    return jnp.where(any_hit, first, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def points_in_boxes_batch(points, boxes, boxes_valid=None):
    """Batched variant: points (B, N, 3+), boxes (B, M, 7) -> (B, N) int32."""
    if boxes_valid is None:
        return jax.vmap(points_in_boxes, in_axes=(0, 0, None))(points, boxes, None)
    return jax.vmap(points_in_boxes)(points, boxes, boxes_valid)
