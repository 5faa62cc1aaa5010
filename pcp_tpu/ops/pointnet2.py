"""PointNet++ primitive ops — TPU-native replacements for the reference CUDA
kernels (`/root/reference/pcdet/ops/pointnet2/pointnet2_batch/src/*.cu`,
`pointnet2_stack/src/*.cu`): farthest point sampling, ball query, grouping,
and 3-NN interpolation.

Design notes (vs the CUDA reference):
- one padded-dense batch layout `(B, N, ...)` with validity masks replaces
  both the reference's "batch" and "stack" flavours (the stack flavour exists
  only because CUDA kernels want ragged concatenation; XLA wants padding);
- features ride channel-last `(B, N, C)` (reference: `(B, C, N)`);
- distance matrices come from one `x·yᵀ` matmul (MXU) instead of per-thread
  scalar loops;
- FPS is a `lax.scan` over the sample count with a running min-distance
  buffer — the same O(npoint·N) as the reference kernel, fully on device.

Exact behavioural matches (differentially tested in tests/test_pointnet2.py):
- ball query keeps the FIRST `nsample` in-radius points in index order and
  pads every slot with the first found index (ball_query_gpu.cu:31-46);
  a query with no in-radius point yields all-zeros (torch.zeros init);
- FPS starts from index 0 (sampling_gpu.cu farthest_point_sampling);
- three_nn returns EUCLIDEAN distance (the wrapper sqrt's the kernel's d²,
  pointnet2_utils.py:98).
"""
import jax
import jax.numpy as jnp

__all__ = [
    "square_distance", "farthest_point_sample", "ball_query", "gather_points",
    "group_points", "three_nn", "three_interpolate",
]


def square_distance(a, b, a_mask=None, b_mask=None, fill=jnp.inf):
    """Pairwise squared L2 distances (B, M, N) between a (B,M,3) and b (B,N,3).

    Masked rows/cols are filled with `fill`. Uses |a|²+|b|²-2a·bᵀ so the O(MN)
    term is a single MXU matmul.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d2 = (
        jnp.sum(a * a, axis=-1)[..., :, None]
        + jnp.sum(b * b, axis=-1)[..., None, :]
        - 2.0 * jnp.einsum("bmc,bnc->bmn", a, b)
    )
    d2 = jnp.maximum(d2, 0.0)
    if b_mask is not None:
        d2 = jnp.where(b_mask[..., None, :], d2, fill)
    if a_mask is not None:
        d2 = jnp.where(a_mask[..., :, None], d2, fill)
    return d2


def farthest_point_sample(xyz, npoint, mask=None):
    """Iterative farthest point sampling. xyz (B, N, 3) -> idx (B, npoint).

    Starts at index 0 like the reference kernel. Invalid (masked) points are
    never selected while any valid point remains.
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    valid = jnp.ones((b, n), bool) if mask is None else mask

    def step(carry, _):
        mind2, last_idx = carry
        last = jnp.take_along_axis(xyz, last_idx[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((xyz - last) ** 2, axis=-1)  # (B,N)
        mind2 = jnp.minimum(mind2, d2)
        nxt = jnp.argmax(jnp.where(valid, mind2, -1.0), axis=-1)
        return (mind2, nxt.astype(jnp.int32)), last_idx

    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b,), jnp.int32))
    _, idx = jax.lax.scan(step, init, None, length=npoint)
    return jnp.transpose(idx)  # (B, npoint)


def ball_query(radius, nsample, xyz, new_xyz, mask=None, new_mask=None):
    """First-`nsample`-in-radius neighbor indices, reference semantics.

    Returns:
        idx: (B, M, nsample) int32 into xyz's N axis; every slot of a query
             with k>0 hits holds a hit (slots >= k replicate the first hit);
             all-zero when the ball is empty.
        empty: (B, M) bool, True where no valid point fell inside the ball.
    """
    d2 = square_distance(new_xyz, xyz, a_mask=new_mask, b_mask=mask)
    inside = d2 < radius * radius  # (B, M, N)
    first = jnp.argmax(inside, axis=-1).astype(jnp.int32)  # 0 if none
    empty = ~jnp.any(inside, axis=-1)
    first = jnp.where(empty, 0, first)

    n = xyz.shape[1]

    def row(ins, fst):  # ins (N,) bool, fst scalar
        rank = jnp.cumsum(ins) - 1
        pos = jnp.where(ins & (rank < nsample), rank, nsample)
        out = jnp.full((nsample + 1,), fst, jnp.int32)
        out = out.at[pos].set(jnp.arange(n, dtype=jnp.int32))
        return out[:nsample]

    idx = jax.vmap(jax.vmap(row))(inside, first)
    return idx, empty


def gather_points(points, idx):
    """points (B, N, C), idx (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_points(points, idx):
    """points (B, N, C), idx (B, M, S) -> (B, M, S, C)."""
    b, m, s = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * s, 1), axis=1)
    return flat.reshape(b, m, s, points.shape[-1])


def three_nn(unknown, known, known_mask=None):
    """3 nearest valid neighbors of each unknown point.

    Returns euclidean dists (B, N, 3) and indices (B, N, 3), matching the
    reference wrapper (sqrt of the kernel's squared distances).
    """
    d2 = square_distance(unknown, known, b_mask=known_mask, fill=1e40)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """features (B, M, C), idx/weight (B, N, 3) -> (B, N, C)."""
    grouped = group_points(features, idx)  # (B, N, 3, C)
    return jnp.sum(grouped * weight[..., None], axis=2)
