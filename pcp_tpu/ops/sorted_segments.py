"""Sorted-order segment primitives (TPU-native replacement for torch_scatter).

After sorting points by pillar id, every segment reduction becomes an
inclusive *segmented scan* and a gather at the segment's last element.
The scans are hand-rolled Hillis–Steele ladders over contiguous shifts —
``lax.associative_scan``'s odd/even slicing is ~5x slower on TPU, and
``searchsorted`` (for segment ends) is ~10x slower than a 1-channel reverse
scan of positions. No XLA scatter (≈270 ns/row on TPU) appears anywhere; the
only dense write is the Pallas BEV kernel.
"""
import jax
import jax.numpy as jnp


def sort_by_pid(pid, arrays):
    """Sort each sample's points by pillar id.

    Args:
        pid: (B, N) int32; arrays: list of (B, N, ...) to reorder alongside.
    Returns:
        pid_sorted, [arrays_sorted...], order (B, N).
    """
    order = jnp.argsort(pid, axis=1)
    pid_s = jnp.take_along_axis(pid, order, axis=1)
    outs = []
    for a in arrays:
        idx = order.reshape(order.shape + (1,) * (a.ndim - 2)) if a.ndim > 2 else order
        outs.append(jnp.take_along_axis(a, idx, axis=1))
    return pid_s, outs, order


def segment_start_flags(pid_sorted):
    """(B, N) bool: True where a new segment begins."""
    prev = jnp.pad(pid_sorted[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    return pid_sorted != prev


def _seg_scan(values, pid_sorted, combine):
    """Inclusive segmented scan along axis 1 via shift ladder.

    For sorted pids, elements i and i-d belong to the same segment iff
    pid[i-d] == pid[i], so each ladder step is one contiguous shift + where.
    values: (B, N, C) or (B, N).
    """
    n = values.shape[1]
    expand = values.ndim == 3
    x = values
    d = 1
    while d < n:
        if expand:
            shifted = jnp.pad(x[:, :-d], ((0, 0), (d, 0), (0, 0)))
        else:
            shifted = jnp.pad(x[:, :-d], ((0, 0), (d, 0)))
        same = jnp.pad(pid_sorted[:, :-d], ((0, 0), (d, 0)), constant_values=-1) == pid_sorted
        if expand:
            same = same[..., None]
        x = jnp.where(same, combine(x, shifted), x)
        d *= 2
    return x


def segment_end_index(pid_sorted):
    """(B, N) int32: index of the last element of each point's segment —
    a reversed 1-channel max-scan of positions."""
    n = pid_sorted.shape[1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], pid_sorted.shape)
    # right-to-left max-scan of positions = last index of each segment
    return _seg_scan(idx[:, ::-1], pid_sorted[:, ::-1], jnp.maximum)[:, ::-1]


def segment_total_to_points(values, pid_sorted, combine=jnp.add, end_idx=None):
    """Per-point segment total (sum/max/...): scan + gather at segment end.

    Args:
        values: (B, N, C) in sorted order.
    Returns:
        (B, N, C) — each point carries its full segment's reduction.
    """
    scanned = _seg_scan(values, pid_sorted, combine)
    if end_idx is None:
        end_idx = segment_end_index(pid_sorted)
    return jnp.take_along_axis(scanned, end_idx[..., None], axis=1)
