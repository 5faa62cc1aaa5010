"""ROI point pooling — TPU-native replacement for the reference
``roipoint_pool3d_cuda`` extension
(/root/reference/pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu):
for every (enlarged) ROI, gather the FIRST `num_sampled_points` contained
points in index order; boxes with fewer hits wrap the found indices
(kernel's duplicate fill), boxes with zero hits raise `pooled_empty_flag`.

The per-thread assign/collect loops become one (B, M, N) containment
broadcast plus the same cumsum first-k trick used by ops.pointnet2.ball_query.
"""
import jax
import jax.numpy as jnp

from .points_in_boxes import points_in_boxes_mask


def enlarge_boxes(rois, extra_width):
    """rois (..., 7+) grown by extra_width on each dim (pool_extra_width)."""
    ew = jnp.asarray(extra_width, rois.dtype)
    return jnp.concatenate(
        [rois[..., :3], rois[..., 3:6] + ew, rois[..., 6:]], axis=-1)


def roipoint_pool3d(points, point_features, rois, num_sampled_points=512,
                    pool_extra_width=(0.0, 0.0, 0.0), points_mask=None):
    """points (B, N, 3), point_features (B, N, C), rois (B, M, 7+).

    Returns:
        pooled: (B, M, S, 3 + C) — xyz then features, global frame;
        empty:  (B, M) bool — True where the enlarged ROI contains no point.
    """
    b, n, _ = points.shape
    m = rois.shape[1]
    s = num_sampled_points
    big = enlarge_boxes(rois[..., :7], pool_extra_width)

    inside = jax.vmap(lambda p, bx: points_in_boxes_mask(p, bx).T)(points, big)  # (B, M, N)
    if points_mask is not None:
        inside = inside & points_mask[:, None, :]

    def row(ins):  # (N,) bool -> idx (S,)
        rank = jnp.cumsum(ins) - 1
        pos = jnp.where(ins & (rank < s), rank, s)
        out = jnp.zeros((s + 1,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
        cnt = jnp.minimum(jnp.sum(ins), s)
        filled = out[:s]
        j = jnp.arange(s)
        return filled[j % jnp.maximum(cnt, 1)], cnt == 0

    idx, empty = jax.vmap(jax.vmap(row))(inside)  # (B, M, S)

    src = jnp.concatenate([points, point_features], axis=-1)  # (B, N, 3+C)
    flat = jnp.take_along_axis(
        src, idx.reshape(b, m * s, 1), axis=1).reshape(b, m, s, src.shape[-1])
    flat = jnp.where(empty[..., None, None], 0.0, flat)
    return flat, empty
