"""Dynamic pillar voxelization primitives in pure JAX.

TPU-native replacement for the reference's GPU dynamic voxelization
(/root/reference/pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:94-147),
which computes per-point pillar coords, compacts them with ``torch.unique`` and
pools with ``torch_scatter``. Compaction produces data-dependent shapes, which
XLA cannot compile; instead we keep the *dense* BEV grid as the segment space:

  * every point maps to a pillar id ``y * nx + x`` (invalid/padding points map
    to a trash slot that is dropped),
  * segment reductions scatter straight into the (ny*nx, C) grid — which is
    exactly the dense BEV image the detector consumes, so the reference's
    separate ``PointPillarScatter`` step fuses away entirely,
  * "gather-back" (broadcast pooled values to points, used by multi-layer PFNs
    and cluster-center features) is a plain gather.

All functions are per-sample; batch via ``jax.vmap``.
"""
import jax
import jax.numpy as jnp


def pillar_coords(points_xy, mask, pc_range, voxel_size, grid_xy):
    """Per-point pillar grid coords + in-range validity.

    Mirrors the reference coord computation (dynamic_pillar_vfe.py:98-101):
    ``floor((xy - range_min) / voxel)`` with points outside [0, grid) dropped.

    Args:
        points_xy: (N, 2) float xy.
        mask: (N,) bool validity of each point (padding).
        pc_range: (6,) array-like point cloud range.
        voxel_size: (2,)+ array-like voxel size (x, y).
        grid_xy: (nx, ny) static ints.
    Returns:
        coords: (N, 2) int32 (x_idx, y_idx), clipped into range.
        valid: (N,) bool — input mask AND in-range.
    """
    nx, ny = grid_xy
    low = jnp.asarray(pc_range[:2], dtype=points_xy.dtype)
    vs = jnp.asarray(voxel_size[:2], dtype=points_xy.dtype)
    coords = jnp.floor((points_xy - low) / vs).astype(jnp.int32)
    in_range = (
        (coords[:, 0] >= 0) & (coords[:, 0] < nx) & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
    )
    valid = mask & in_range
    coords = jnp.clip(coords, 0, jnp.asarray([nx - 1, ny - 1], dtype=jnp.int32))
    return coords, valid


def pillar_ids(coords, valid, grid_xy):
    """Flat pillar id ``y * nx + x``; invalid points get ``nx * ny`` (trash slot)."""
    nx, ny = grid_xy
    pid = coords[:, 1] * nx + coords[:, 0]
    return jnp.where(valid, pid, nx * ny).astype(jnp.int32)


def segment_sum_grid(values, pids, num_pillars):
    """Scatter-add point values into the pillar grid.

    Args:
        values: (N, C), pids: (N,) int32 in [0, num_pillars] (== num_pillars drops).
    Returns:
        (num_pillars, C) sums.
    """
    out = jnp.zeros((num_pillars, values.shape[-1]), dtype=values.dtype)
    return out.at[pids].add(values, mode="drop")


def segment_max_grid(values, pids, num_pillars, init=0.0):
    """Scatter-max point values into the pillar grid.

    Empty pillars keep ``init`` (= 0, matching the reference where pillars
    without points simply don't exist in the sparse list and the dense BEV
    stays zero; pooled features are post-ReLU, so max>=0 for non-empty pillars).
    """
    out = jnp.full((num_pillars, values.shape[-1]), init, dtype=values.dtype)
    return out.at[pids].max(values, mode="drop")


def segment_count(pids, num_pillars, dtype=jnp.float32):
    ones = jnp.ones((pids.shape[0], 1), dtype=dtype)
    return segment_sum_grid(ones, pids, num_pillars)[:, 0]


def cluster_centers(points_xyz, pids, num_pillars):
    """Per-pillar mean xyz gathered back per point (the reference's
    ``scatter_mean`` + gather, dynamic_pillar_vfe.py:110-111).

    Returns:
        (N, 3) cluster center of each point's pillar.
    """
    sums = segment_sum_grid(points_xyz, pids, num_pillars + 1)
    cnt = segment_count(pids, num_pillars + 1, dtype=points_xyz.dtype)
    means = sums / jnp.maximum(cnt, 1.0)[:, None]
    return means[jnp.clip(pids, 0, num_pillars)]


def gather_from_grid(grid_values, pids):
    """Broadcast pooled pillar values back to points: (P, C)[(N,)] -> (N, C)."""
    return grid_values[jnp.clip(pids, 0, grid_values.shape[0] - 1)]
