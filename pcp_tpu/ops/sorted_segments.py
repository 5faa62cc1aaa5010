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

    The payload channels ride `lax.sort` as extra operands instead of a
    post-argsort gather: on v5e the (B=8, N=32k, 11ch) gather costs ~2.9 ms
    while the multi-operand sort is ~0.8 ms total (row gathers on TPU pay
    per-row latency; the sort network moves lanes in bulk).

    Args:
        pid: (B, N) int32; arrays: list of (B, N[, C]) to reorder alongside.
    Returns:
        pid_sorted, [arrays_sorted...], order (B, N).
    """
    b, n = pid.shape
    chans = []  # flattened payload channels
    splits = []
    for a in arrays:
        if a.ndim == 2:
            chans.append(a)
            splits.append(None)
        else:
            c = a.shape[2]
            chans.extend(a[..., i] for i in range(c))
            splits.append(c)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    res = jax.lax.sort((pid, iota, *chans), dimension=1, num_keys=1)
    pid_s, order = res[0], res[1]
    flat = list(res[2:])
    outs = []
    for a, c in zip(arrays, splits):
        if c is None:
            outs.append(flat.pop(0))
        else:
            outs.append(jnp.stack([flat.pop(0) for _ in range(c)], axis=-1))
    return pid_s, outs, order


def segment_start_flags(pid_sorted):
    """(B, N) bool: True where a new segment begins."""
    prev = jnp.pad(pid_sorted[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    return pid_sorted != prev


def _seg_scan_flat(values, pid_sorted, combine, axis_len):
    """Shift-ladder inclusive segmented scan along axis -2 (or -1 for 2-D).

    For sorted pids, elements i and i-d belong to the same segment iff
    pid[i-d] == pid[i], so each ladder step is one contiguous shift + where.
    """
    expand = values.ndim == pid_sorted.ndim + 1
    nd = pid_sorted.ndim
    x = values
    d = 1
    while d < axis_len:
        pad_pid = [(0, 0)] * nd
        pad_pid[-1] = (d, 0)
        pad_val = [(0, 0)] * values.ndim
        pad_val[nd - 1] = (d, 0)
        if expand:
            shifted = jnp.pad(x[..., :-d, :], pad_val)
        else:
            shifted = jnp.pad(x[..., :-d], pad_val)
        same = jnp.pad(pid_sorted[..., :-d], pad_pid, constant_values=-1) == pid_sorted
        if expand:
            same = same[..., None]
        x = jnp.where(same, combine(x, shifted), x)
        d *= 2
    return x


_TILE = 256


def _seg_scan(values, pid_sorted, combine):
    """Inclusive segmented scan along axis 1, two-level tiled.

    Large-N scans split into (T, 256) tiles: 8 intra-tile ladder steps over
    the full data + a 7-step carry scan over the tiny (B, T) tile tails +
    one masked fix-up — ~half the HBM traffic of a flat 15-step ladder.
    Results are bit-identical to the flat ladder for add/max combines over
    sorted pids.
    values: (B, N, C) or (B, N).
    """
    n = values.shape[1]
    if n <= _TILE or n % _TILE != 0:
        return _seg_scan_flat(values, pid_sorted, combine, n)

    b = values.shape[0]
    t = n // _TILE
    expand = values.ndim == 3
    if expand:
        xv = values.reshape(b, t, _TILE, values.shape[-1])
    else:
        xv = values.reshape(b, t, _TILE)
    pid_t = pid_sorted.reshape(b, t, _TILE)

    # level 1: scan within tiles (pid axis is the last axis of pid_t)
    intra = _seg_scan_flat(xv, pid_t, combine, _TILE)

    # level 2: carry = each tile's last (fully-scanned) element, propagated
    # across consecutive tiles that share a segment boundary
    tail = intra[:, :, -1] if not expand else intra[:, :, -1, :]  # (B, T[, C])
    pid_first = pid_t[:, :, 0]  # (B, T)
    pid_last = pid_t[:, :, -1]
    # exclusive: shift tails right by one tile; tile 0 gets no carry
    if expand:
        carry = jnp.pad(tail[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    else:
        carry = jnp.pad(tail[:, :-1], ((0, 0), (1, 0)))
    prev_last = jnp.pad(pid_last[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    # carries chain while pid_first[t] == pid_last[t-1]; use pid_first as the
    # segment key for the carry scan, masking broken links to a sentinel
    link_ok = pid_first == prev_last
    carry_pid = jnp.where(link_ok, pid_first, -jnp.arange(t)[None, :] - 2)
    carry = jnp.where(link_ok[..., None] if expand else link_ok, carry, jnp.zeros_like(carry))
    # identity for max over post-ReLU/any values: use where to skip instead of
    # relying on 0 — scan carries segmented by carry_pid
    carry = _seg_scan_flat(carry, carry_pid, combine, t)
    carry = jnp.where(link_ok[..., None] if expand else link_ok, carry, jnp.zeros_like(carry))

    # fix-up: elements in the tile's LEADING run (pid == pid_first) that
    # continue the previous tile's segment receive the carry
    leading = (pid_t == pid_first[:, :, None]) & link_ok[:, :, None]
    if expand:
        fixed = jnp.where(leading[..., None], combine(intra, carry[:, :, None, :]), intra)
    else:
        fixed = jnp.where(leading, combine(intra, carry[:, :, None]), intra)
    return fixed.reshape(values.shape)


def segment_end_index(pid_sorted):
    """(B, N) int32: index of the last element of each point's segment —
    a reversed 1-channel max-scan of positions."""
    n = pid_sorted.shape[1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], pid_sorted.shape)
    # right-to-left max-scan of positions = last index of each segment
    return _seg_scan(idx[:, ::-1], pid_sorted[:, ::-1], jnp.maximum)[:, ::-1]


def _select_earlier(x, shifted):
    """Associative 'take the earlier (left) accumulated value' combine for the
    shift ladder: propagates each segment's FIRST element to every member."""
    return shifted


def segment_broadcast_first(values, pid_sorted):
    """(B, N[, C]): every element receives its segment's first value — an
    inclusive segmented scan with the (associative) select-earlier combine."""
    return _seg_scan(values, pid_sorted, _select_earlier)


def segment_total_to_points(values, pid_sorted, combine=jnp.add, end_idx=None):
    """Per-point segment total (sum/max/...): forward scan, then a reverse
    select-first scan that propagates each segment's last (= fully reduced)
    value to all members.

    This is gather-free: XLA row gathers cost ~270 ns/row on TPU (a
    take_along_axis at segment ends measured ~7 ms for a (8, 32768, C)
    batch), while the extra scan pass is ~0.1-0.7 ms. ``end_idx`` is accepted
    for backward compatibility and ignored.

    Args:
        values: (B, N, C) in sorted order.
    Returns:
        (B, N, C) — each point carries its full segment's reduction.
    """
    del end_idx
    scanned = _seg_scan(values, pid_sorted, combine)
    rev = _seg_scan(scanned[:, ::-1], pid_sorted[:, ::-1], _select_earlier)
    return rev[:, ::-1]
