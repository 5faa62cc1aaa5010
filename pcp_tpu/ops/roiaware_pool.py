"""ROI-aware grid pooling — TPU-native replacement for the reference
``roiaware_pool3d_cuda`` max/avg pooling
(/root/reference/pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:111-311):
every point inside a ROI lands in one cell of a P^3 grid fixed to the ROI's
canonical frame; cells pool their points by max or mean.

The per-point CUDA assignment loops become one (B, R, N) containment/cell
computation plus a single scatter-max / scatter-add into (B, R*P^3, C).
The CUDA kernel's MAX_PTS_EACH_VOXEL cap does not exist here (exact pooling
over all contained points — strictly more information).
"""
import jax
import jax.numpy as jnp


def rotate_points_along_z_jnp(points, angle):
    """points (..., N, 3), angle (...,) -> rotated about +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([c, s, zeros, -s, c, zeros, zeros, zeros, ones], axis=-1)
    rot = rot.reshape(rot.shape[:-1] + (3, 3))
    return jnp.einsum("...nj,...jk->...nk", points, rot)


def roiaware_pool3d(points, point_features, rois, out_size=14, pool_method="max",
                    points_mask=None):
    """points (B, N, 3), point_features (B, N, C), rois (B, R, 7).

    Returns pooled (B, R, P, P, P, C) — grid axes ordered (x, y, z) like the
    reference kernel's out_x/out_y/out_z.
    """
    b, n, _ = points.shape
    r = rois.shape[1]
    p = out_size
    c = point_features.shape[-1]

    # canonical-frame coords of every point for every roi: (B, R, N, 3)
    rel = points[:, None, :, :] - rois[:, :, None, 0:3]
    rel = rotate_points_along_z_jnp(
        rel.reshape(b * r, n, 3), -rois[..., 6].reshape(b * r)).reshape(b, r, n, 3)
    dims = jnp.maximum(rois[:, :, None, 3:6], 1e-3)
    unit = rel / dims + 0.5  # [0, 1) inside the box
    inside = jnp.all((unit >= 0.0) & (unit < 1.0), axis=-1)
    if points_mask is not None:
        inside = inside & points_mask[:, None, :]
    cell = jnp.clip((unit * p).astype(jnp.int32), 0, p - 1)
    cell_id = (cell[..., 0] * p + cell[..., 1]) * p + cell[..., 2]  # x-major

    # scatter target: flatten (B, R, P^3)
    tgt = jnp.where(inside, cell_id, p ** 3)  # OOB row dropped
    flat_tgt = (tgt + jnp.arange(r)[None, :, None] * (p ** 3 + 1)).reshape(b, r * n)
    # use (P^3+1) stride so the drop slot of each roi stays distinct, then trim
    feats = jnp.broadcast_to(point_features[:, None], (b, r, n, c)).reshape(b, r * n, c)

    total = r * (p ** 3 + 1)
    if pool_method == "max":
        init = jnp.full((b, total, c), -jnp.inf, point_features.dtype)
        pooled = jax.vmap(lambda buf, idx, val: buf.at[idx].max(val))(
            init, flat_tgt, feats)
        pooled = pooled.reshape(b, r, p ** 3 + 1, c)[:, :, : p ** 3]
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    elif pool_method == "avg":
        init = jnp.zeros((b, total, c), point_features.dtype)
        sums = jax.vmap(lambda buf, idx, val: buf.at[idx].add(val))(
            init, flat_tgt, feats)
        ones = jnp.broadcast_to(inside[..., None], (b, r, n, 1)).astype(
            point_features.dtype).reshape(b, r * n, 1)
        cnts = jax.vmap(lambda buf, idx, val: buf.at[idx].add(val))(
            jnp.zeros((b, total, 1), point_features.dtype), flat_tgt, ones)
        pooled = (sums.reshape(b, r, p ** 3 + 1, c)[:, :, : p ** 3]
                  / jnp.maximum(cnts.reshape(b, r, p ** 3 + 1, 1)[:, :, : p ** 3], 1.0))
    else:
        raise NotImplementedError(pool_method)
    return pooled.reshape(b, r, p, p, p, c)
