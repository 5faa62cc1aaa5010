"""Pallas TPU kernel: sorted pillar features -> dense BEV (segment max).

The flagship kernel of the pillar pipeline. XLA's scatter lowers to ~270 ns
per update row on TPU (50+ ms for a 262k-point batch); this kernel exploits
that the points are pre-sorted by pillar id, so the touched BEV rows appear in
raster order:

  * the grid walks output row-tiles in order; each tile's relevant points are
    a contiguous range of the sorted array (per-tile start offsets computed
    with one searchsorted on the XLA side, passed via scalar prefetch);
  * pillar ids stream HBM -> SMEM in fixed chunks (scalar reads of dynamic
    lane positions are illegal in VMEM — ids must be scalar memory);
  * each grid step zeroes its (R*W, C) tile in VMEM and walks its point range
    with dynamic-sublane max-accumulation (a few cycles per point instead of
    an HBM round-trip per update), then the tile streams out coalesced;
  * the per-sample feature block is reused across row-tiles (its block index
    is constant in t, so Pallas skips the re-fetch).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024
# manual unroll depth of the per-point accumulation loop: measured on v5e
# (b8 x 32768 pts, 64ch, 512x512) 10.9 -> 8.0 ms at 8; with dynamic loop
# bounds (walk only the tile's point range) 6.6 at 8, 6.4 at 16
UNROLL = 16


def _make_tails_kernel(n, rw, c, chunk):
    """Pre-reduced variant: every row already carries its full segment max
    (XLA-side segmented scan), and only segment-TAIL rows are written — one
    store per occupied pillar instead of one accumulate per point. At real
    cloud occupancy (5-20 points/pillar) this cuts the dynamic-sublane
    traffic 5-20x; at ~1 point/pillar the per-row branch makes it a wash."""
    num_chunks = (n + chunk - 1) // chunk

    def kernel(starts_ref, pids_hbm, tails_hbm, feats_hbm, out_ref,
               pid_smem, tail_smem, feat_vmem, dma_sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        base = t * rw

        out_ref[...] = jnp.zeros_like(out_ref)

        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]

        for k in range(num_chunks):
            c0 = k * chunk

            @pl.when((c0 < end) & (c0 + chunk > start))
            def _process_chunk(c0=c0):
                pid_copy = pltpu.make_async_copy(
                    pids_hbm.at[pl.ds(b * n + c0, chunk)], pid_smem, dma_sems.at[0]
                )
                tail_copy = pltpu.make_async_copy(
                    tails_hbm.at[pl.ds(b * n + c0, chunk)], tail_smem, dma_sems.at[2]
                )
                feat_copy = pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(b * n + c0, chunk), :], feat_vmem, dma_sems.at[1]
                )
                pid_copy.start()
                tail_copy.start()
                feat_copy.start()
                pid_copy.wait()
                tail_copy.wait()
                feat_copy.wait()

                def body(j, _):
                    i = c0 + j
                    raw = pid_smem[j] - base
                    ok = ((i >= start) & (i < end) & (raw >= 0) & (raw < rw)
                          & (tail_smem[j] != 0))

                    @pl.when(ok)
                    def _store():
                        # single writer per pillar (one tail per segment), and
                        # the tile was zeroed: a plain store suffices
                        out_ref[0, raw, :] = feat_vmem[j, :][:c]

                    return _

                jax.lax.fori_loop(0, chunk, body, None)

    return kernel


def _make_fused_kernel(n, rw, c, chunk):
    """Fused variant: the chunk-local segmented max runs INSIDE the kernel as
    a log2(chunk)-step shift sweep over the (chunk, C) VMEM block, so the
    XLA-side 64-channel segmented scan (~4 ms HBM-bound on b8) disappears;
    then only segment-tail rows are folded into the tile with a read-max-write
    (skipped rows cost a predicated branch, ~4 cycles, vs ~30 for the RMW).
    Segments spanning chunk boundaries are handled by forcing a tail at the
    last row of every chunk (each chunk then contributes its partial max) —
    the RMW-max store makes multiple partial stores per pillar safe."""
    num_chunks = (n + chunk - 1) // chunk

    def kernel(starts_ref, pids_hbm, tails_hbm, feats_hbm, out_ref,
               pid_smem, tail_smem, feat_vmem, dma_sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        base = t * rw

        out_ref[...] = jnp.zeros_like(out_ref)

        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]

        for k in range(num_chunks):
            c0 = k * chunk

            @pl.when((c0 < end) & (c0 + chunk > start))
            def _process_chunk(c0=c0):
                copies = [
                    pltpu.make_async_copy(
                        pids_hbm.at[pl.ds(b * n + c0, chunk)], pid_smem, dma_sems.at[0]
                    ),
                    pltpu.make_async_copy(
                        tails_hbm.at[pl.ds(b * n + c0, chunk)], tail_smem, dma_sems.at[1]
                    ),
                    pltpu.make_async_copy(
                        feats_hbm.at[pl.ds(b * n + c0, chunk), :], feat_vmem, dma_sems.at[2]
                    ),
                ]
                for cp in copies:
                    cp.start()
                for cp in copies:
                    cp.wait()

                # vectorized Hillis-Steele segmented max over the chunk: after
                # the sweep every row holds the max over all earlier same-pid
                # rows of the chunk, so each tail row carries its segment's
                # full (chunk-local) max. The pillar id rides lane ``c`` of
                # the (128-lane-padded) feature block as an exact f32
                # (ids < 2^24; a 1-lane HBM DMA is not tile-alignable, the pad
                # lane is free, and maxing equal ids is a no-op), giving the
                # VPU a vector view of the ids without a second block DMA.
                # Rows of other tiles have different pids, so the sweep never
                # mixes across the window.
                v = feat_vmem[...]
                p = v[:, c:c + 1]
                row_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                d = 1
                while d < chunk:
                    same = (pltpu.roll(p, d, 0) == p) & (row_idx >= d)
                    v = jnp.where(same, jnp.maximum(v, pltpu.roll(v, d, 0)), v)
                    d *= 2
                feat_vmem[...] = v

                def body(j, _):
                    i = c0 + j
                    raw = pid_smem[j] - base
                    ok = ((i >= start) & (i < end) & (raw >= 0) & (raw < rw)
                          & (tail_smem[j] != 0))

                    @pl.when(ok)
                    def _store():
                        # RMW max: chunk-boundary partial tails may store the
                        # same pillar more than once
                        out_ref[0, raw, :] = jnp.maximum(
                            out_ref[0, raw, :], feat_vmem[j, :][:c]
                        )

                    return _

                jax.lax.fori_loop(0, chunk, body, None)

    return kernel


def _make_runs_kernel(n, rw, c, chunk):
    """Register-accumulated runs: the sort makes rows NON-DECREASING in j, so
    each pillar's points form one contiguous run. The kernel keeps the current
    run's max in a vector register (fori carry) and issues ONE plain store per
    run when the row changes — no per-point read-modify-write, no per-point
    dynamic-sublane access (the UNROLL feature rows arrive as one block read).
    Dead lanes (outside [start,end) or the tile's rows) keep the current row
    with a zero value (max-identity, feats >= 0). The carry crosses chunk
    boundaries via SMEM/VMEM scratch; the final run is flushed after the last
    chunk (plain store — a run is stored exactly once, onto a zeroed tile)."""
    num_chunks = (n + chunk - 1) // chunk

    def kernel(starts_ref, pids_hbm, feats_hbm, out_ref, pid_smem, feat_vmem,
               currow_smem, acc_vmem, dma_sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        base = t * rw

        out_ref[...] = jnp.zeros_like(out_ref)
        currow_smem[0] = 0
        acc_vmem[...] = jnp.zeros_like(acc_vmem)

        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]

        for k in range(num_chunks):
            c0 = k * chunk

            @pl.when((c0 < end) & (c0 + chunk > start))
            def _process_chunk(c0=c0):
                pid_copy = pltpu.make_async_copy(
                    pids_hbm.at[pl.ds(b * n + c0, chunk)], pid_smem, dma_sems.at[0]
                )
                feat_copy = pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(b * n + c0, chunk), :], feat_vmem, dma_sems.at[1]
                )
                pid_copy.start()
                feat_copy.start()
                pid_copy.wait()
                feat_copy.wait()

                def body(jj, carry):
                    cur_row, acc = carry  # acc: (1, c) vreg-resident
                    base_j = jj * UNROLL
                    val8 = feat_vmem[pl.ds(base_j, UNROLL), :]
                    for u in range(UNROLL):
                        j = base_j + u
                        i = c0 + j
                        raw = pid_smem[j] - base
                        ok = (i >= start) & (i < end) & (raw >= 0) & (raw < rw)
                        row = jnp.where(ok, raw, cur_row)
                        val = jnp.where(ok, val8[u:u + 1, :c], 0.0)
                        is_new = row != cur_row

                        @pl.when(is_new)
                        def _flush(cur_row=cur_row, acc=acc):
                            # first (and only) store for the finished run
                            out_ref[0, pl.ds(cur_row, 1), :] = acc

                        acc = jnp.where(is_new, val, jnp.maximum(acc, val))
                        cur_row = row
                    return cur_row, acc

                cur_row, acc = jax.lax.fori_loop(
                    0, chunk // UNROLL, body, (currow_smem[0], acc_vmem[...])
                )
                currow_smem[0] = cur_row
                acc_vmem[...] = acc

        # last run of the tile: never stored by the loop (no row change after
        # it); RMW-max in case no valid point ever advanced cur_row off a row
        # that a plain store would clobber with the zero init accumulator
        fr = currow_smem[0]
        out_ref[0, pl.ds(fr, 1), :] = jnp.maximum(
            out_ref[0, pl.ds(fr, 1), :], acc_vmem[...]
        )

    return kernel


def _make_onehot_kernel(n, rw, c, chunk):
    """One-hot matmul placement: ZERO serial scalar work. The per-point walk
    variants above cost ~23 cycles/point on the scalar core (the kernel floor
    ROADMAP documents); this variant replaces the walk entirely:

      * the chunk-local segmented max sweep (log2(chunk) vectorized shift
        steps, as in ``_make_fused_kernel``) leaves every segment-TAIL row
        carrying its chunk-local max, so each BEV cell has AT MOST ONE
        contributing row per chunk;
      * placement therefore equals ``onehot(cell_ids).T @ masked_rows`` — a
        single MXU matmul per chunk (sum over a one-hot column IS the unique
        contributor), max-accumulated into the tile across chunks (segments
        spanning chunk boundaries contribute per-chunk partial maxima via the
        forced last-row tail, exactly like the fused variant);
      * values ride the matmul as a 3-way bf16 split (hi/mid/lo, 24 mantissa
        bits), recovering f32 to ~2^-24 relative — the one-hot side is exact
        in bf16, and with one contributor per cell there is no summation
        rounding at all.

    The pillar id rides lane ``c`` of the 128-lane-padded feature block as an
    exact f32 (ids < 2^24), so the kernel needs NO SMEM and no scalar reads;
    chunk DMAs run under a dynamic fori over only the tile's chunk range.
    """
    num_chunks = (n + chunk - 1) // chunk
    del num_chunks

    def kernel(starts_ref, feats_hbm, out_ref, feat_vmem, dma_sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        base = t * rw

        out_ref[...] = jnp.zeros_like(out_ref)

        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]

        def body(k, _):
            c0 = k * chunk
            cp = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(b * n + c0, chunk), :], feat_vmem, dma_sem.at[0]
            )
            cp.start()
            cp.wait()
            v = feat_vmem[...]  # (chunk, 128) f32; lane c carries the pid
            p = v[:, c:c + 1]
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            d = 1
            while d < chunk:
                same = (pltpu.roll(p, d, 0) == p) & (row_idx >= d)
                v = jnp.where(same, jnp.maximum(v, pltpu.roll(v, d, 0)), v)
                d *= 2
            # tails: segment's last row within the chunk (wrap row at
            # chunk-1 is forced — its roll neighbour is row 0's pid)
            nxtp = pltpu.roll(p, chunk - 1, 0)
            tail = (p != nxtp) | (row_idx == chunk - 1)
            gi = row_idx + c0
            local = p - base.astype(jnp.float32)
            valid = (tail & (gi >= start) & (gi < end)
                     & (local >= 0) & (local < rw))
            vals = jnp.where(valid, v[:, :c], 0.0)
            hi = vals.astype(jnp.bfloat16)
            r1 = vals - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            m3 = jnp.concatenate([hi, mid, lo], axis=1)  # (chunk, 3c) bf16
            # integer compare (Mosaic iota is int-only; the f32->i32 cast is
            # exact for ids < 2^24, negatives clamp below any valid cell)
            cell = jax.lax.broadcasted_iota(jnp.int32, (chunk, rw), 1)
            li = jnp.where(valid, local, -1.0).astype(jnp.int32)
            oh = (li == cell).astype(jnp.bfloat16)
            res = jax.lax.dot_general(
                oh, m3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)  # (rw, 3c)
            res = res[:, :c] + res[:, c:2 * c] + res[:, 2 * c:]
            out_ref[0, :, :] = jnp.maximum(out_ref[0, :, :], res)
            return _

        k_lo = start // chunk
        k_hi = (end + chunk - 1) // chunk
        jax.lax.fori_loop(k_lo, k_hi, body, None)

    return kernel


def _make_kernel(n, rw, c, chunk):
    num_chunks = (n + chunk - 1) // chunk

    def kernel(starts_ref, pids_hbm, feats_hbm, out_ref, pid_smem, feat_vmem, dma_sems):
        # pids_hbm (B*N,) and feats_hbm (B*N, C) stay in HBM; each chunk of
        # ids goes to SMEM (scalar reads) and features to a VMEM scratch
        b = pl.program_id(0)
        t = pl.program_id(1)
        base = t * rw

        out_ref[...] = jnp.zeros_like(out_ref)

        start = starts_ref[b, t]
        end = starts_ref[b, t + 1]

        for k in range(num_chunks):
            c0 = k * chunk

            @pl.when((c0 < end) & (c0 + chunk > start))
            def _process_chunk(c0=c0):
                pid_copy = pltpu.make_async_copy(
                    pids_hbm.at[pl.ds(b * n + c0, chunk)], pid_smem, dma_sems.at[0]
                )
                feat_copy = pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(b * n + c0, chunk), :], feat_vmem, dma_sems.at[1]
                )
                pid_copy.start()
                feat_copy.start()
                pid_copy.wait()
                feat_copy.wait()

                # branch-free unrolled accumulation: out-of-range points are
                # routed to row 0 with a zero value (max-identity — features
                # are post-ReLU >= 0 and empty cells hold 0), which drops the
                # per-point pl.when and lets Mosaic software-pipeline the
                # UNROLL-deep body. The UNROLL feature rows are fetched as ONE
                # dynamic-sublane block read (static row extracts after) —
                # one dynamic access instead of UNROLL per group.
                def body(jj, _):
                    base_j = jj * UNROLL
                    val8 = feat_vmem[pl.ds(base_j, UNROLL), :]
                    for u in range(UNROLL):
                        j = base_j + u
                        i = c0 + j
                        raw = pid_smem[j] - base
                        ok = (i >= start) & (i < end) & (raw >= 0) & (raw < rw)
                        row = jnp.where(ok, raw, 0)
                        # feat rows are 128-lane padded for DMA alignment;
                        # value-slice back to the real channel count
                        val = jnp.where(ok, val8[u, :][:c], 0.0)
                        out_ref[0, row, :] = jnp.maximum(out_ref[0, row, :], val)
                    return _

                # dynamic loop bounds: walk only the UNROLL-groups that can
                # hold this tile's [start, end) point range instead of the
                # whole chunk (a tile's range typically covers a fraction of
                # the chunks it touches; the ok-predicate keeps correctness
                # at the rounded edges)
                lo = jnp.maximum(start - c0, 0) // UNROLL
                hi = (jnp.minimum(end - c0, chunk) + UNROLL - 1) // UNROLL
                jax.lax.fori_loop(lo, hi, body, None)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bev_scatter_max_sorted(feats_sorted, pids_sorted, h, w, interpret=False):
    """Differentiable wrapper: forward runs the kernel; backward splits each
    output cell's cotangent evenly across the points tying the max (a valid
    subgradient with weights summing to 1; torch_scatter picks one winner).
    Requires feats >= 0 (post-ReLU), matching the reference PFN, since empty
    cells hold 0."""
    return _bev_scatter_max_impl(feats_sorted, pids_sorted, h, w, interpret)


def _bev_fwd(feats_sorted, pids_sorted, h, w, interpret):
    out = _bev_scatter_max_impl(feats_sorted, pids_sorted, h, w, interpret)
    return out, (feats_sorted, pids_sorted, out)


def _bev_bwd_impl(h, w, res, g, rtol=0.0):
    """Shared tie-splitting VJP for all scatter-max variants.

    ``rtol=0`` matches a point's feature to its cell max exactly (bit-exact
    forwards); the one-hot forward rounds values by ~2^-24 (3-way bf16
    split), so its VJP passes ``rtol`` just above that rounding error to let
    the true argmax still receive the cotangent — and nothing else."""
    feats, pids, out = res
    b, n, c = feats.shape
    flat_out = out.reshape(b, h * w, c)
    flat_g = g.reshape(b, h * w, c)
    safe_pid = jnp.clip(pids, 0, h * w - 1)[..., None]
    cell_max = jnp.take_along_axis(flat_out, safe_pid, axis=1)
    cell_g = jnp.take_along_axis(flat_g, safe_pid, axis=1)
    if rtol:
        tol = rtol * jnp.abs(cell_max) + 1e-30
        is_max = (jnp.abs(feats - cell_max) <= tol) & (pids < h * w)[..., None]
    else:
        is_max = (feats == cell_max) & (pids < h * w)[..., None]
    # split the cotangent across ties so the per-cell gradient weights sum to
    # 1 (ties at 0.0 are common post-ReLU; routing the full cotangent to every
    # tied point would overcount). pids are sorted, so the tie count is a
    # sorted-segment sum (no scatter).
    from ..sorted_segments import segment_total_to_points

    ties = segment_total_to_points(is_max.astype(feats.dtype), pids, jnp.add)
    return (jnp.where(is_max, cell_g / jnp.maximum(ties, 1.0), 0.0), None)


def _bev_bwd(h, w, interpret, res, g):
    return _bev_bwd_impl(h, w, res, g, rtol=0.0)


bev_scatter_max_sorted.defvjp(_bev_fwd, _bev_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bev_scatter_max_sorted_prereduced(feats_sorted, pids_sorted, h, w, interpret=False):
    """Pre-reduced forward: an XLA-side segmented max-scan folds each segment
    to its tail row, then the tails kernel does ONE store per occupied pillar
    (vs one accumulate per point). Numerically identical to
    :func:`bev_scatter_max_sorted`; preferable at realistic cloud occupancy
    (>= ~4 points/pillar). Same feats >= 0 requirement and tie-splitting VJP."""
    out, _ = _bev_prereduced_fwd(feats_sorted, pids_sorted, h, w, interpret)
    return out


def _bev_prereduced_fwd(feats_sorted, pids_sorted, h, w, interpret):
    from ..sorted_segments import segment_total_to_points

    red = segment_total_to_points(feats_sorted, pids_sorted, jnp.maximum)
    nxt = jnp.pad(pids_sorted[:, 1:], ((0, 0), (0, 1)), constant_values=-1)
    tails = (pids_sorted != nxt).astype(jnp.int32)
    out = _bev_scatter_max_tails_impl(red, pids_sorted, tails, h, w, interpret)
    return out, (feats_sorted, pids_sorted, out)


bev_scatter_max_sorted_prereduced.defvjp(_bev_prereduced_fwd, _bev_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bev_scatter_max_sorted_fused(feats_sorted, pids_sorted, h, w, interpret=False):
    """Fused pre-reduction: the segmented max runs inside the Pallas kernel
    (log-sweep over each chunk's VMEM block) and only segment-tail rows are
    folded into the BEV tile. Numerically identical to
    :func:`bev_scatter_max_sorted`; fastest at realistic cloud occupancy
    (>= ~4 points/pillar) and within noise of the per-point kernel on
    near-unique pillar ids. Same feats >= 0 requirement (empty cells hold 0)
    and tie-splitting VJP."""
    out, _ = _bev_fused_fwd(feats_sorted, pids_sorted, h, w, interpret)
    return out


def _bev_fused_fwd(feats_sorted, pids_sorted, h, w, interpret):
    out = _bev_scatter_max_fused_impl(feats_sorted, pids_sorted, h, w, interpret)
    return out, (feats_sorted, pids_sorted, out)


bev_scatter_max_sorted_fused.defvjp(_bev_fused_fwd, _bev_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bev_scatter_max_sorted_onehot(feats_sorted, pids_sorted, h, w, interpret=False):
    """One-hot-matmul placement (see ``_make_onehot_kernel``): the serial
    per-point scalar walk disappears entirely — the MXU places each segment
    max via ``onehot.T @ rows``. Matches :func:`bev_scatter_max_sorted` to
    ~2^-24 relative (3-way bf16 value split; the placement itself is exact).
    Same feats >= 0 requirement and tie-splitting VJP."""
    out, _ = _bev_onehot_fwd(feats_sorted, pids_sorted, h, w, interpret)
    return out


def _bev_onehot_fwd(feats_sorted, pids_sorted, h, w, interpret):
    out = _bev_scatter_max_onehot_impl(feats_sorted, pids_sorted, h, w, interpret)
    return out, (feats_sorted, pids_sorted, out)


def _bev_onehot_bwd(h, w, interpret, res, g):
    # rtol just above the forward's ~2^-24 (~6e-8) rounding: 2^-23 covers the
    # bf16-split error without letting distinct non-max points share the
    # cotangent (ADVICE r3: 1e-6 was ~17x looser than the rounding it covers)
    return _bev_bwd_impl(h, w, res, g, rtol=1.2e-7)


bev_scatter_max_sorted_onehot.defvjp(_bev_onehot_fwd, _bev_onehot_bwd)


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _bev_scatter_max_impl(feats_sorted, pids_sorted, h, w, interpret=False):
    """Args:
        feats_sorted: (B, N, C) float — point features, sorted by pillar id
            within each sample (invalid/padding points must sort last with
            pid == h*w).
        pids_sorted: (B, N) int32 — sorted flat pillar ids in [0, h*w]; h*w
            marks padding.
    Returns:
        (B, h, w, C) max-pooled dense BEV (empty pillars = 0).
    """
    b, n, c = feats_sorted.shape
    # chunk is always the full CHUNK: int32 SMEM DMA slices must be aligned
    # to the (1024,) tiling — a smaller final chunk fails Mosaic
    chunk = CHUNK
    if n % chunk:  # pad to a whole number of chunks; pads carry pid == h*w
        pad_n = chunk - n % chunk
        feats_sorted = jnp.pad(feats_sorted, ((0, 0), (0, pad_n), (0, 0)))
        pids_sorted = jnp.pad(pids_sorted, ((0, 0), (0, pad_n)), constant_values=h * w)
        n = n + pad_n
    rows_per_tile = max(1, min(32, 2 * 1024 * 1024 // max(w * c * 4, 1)))
    while h % rows_per_tile != 0:
        rows_per_tile -= 1
    t = h // rows_per_tile
    rw = rows_per_tile * w

    c_pad = -(-c // 128) * 128
    boundaries = jnp.arange(t + 1, dtype=jnp.int32) * rw
    starts = jax.vmap(lambda p: jnp.searchsorted(p, boundaries, side="left"))(
        pids_sorted
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) ids in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N, C) feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, ti, s: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, c_pad), feats_sorted.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    feats_flat = feats_sorted.reshape(b * n, c)
    if c_pad != c:
        feats_flat = jnp.pad(feats_flat, ((0, 0), (0, c_pad - c)))
    out = pl.pallas_call(
        _make_kernel(n, rw, c, chunk),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), feats_sorted.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, pids_sorted.reshape(-1), feats_flat)
    return out.reshape(b, h, w, c)


# one-hot variant tunables (microbenched on v5e, see tools/bench_scatter_kernel.py)
ONEHOT_CHUNK = 256
ONEHOT_ROWS = 2


@partial(jax.jit, static_argnames=("h", "w", "interpret", "chunk", "rows"))
def _bev_scatter_max_onehot_impl(feats_sorted, pids_sorted, h, w, interpret=False,
                                 chunk=None, rows=None):
    """Same contract as :func:`_bev_scatter_max_impl`; MXU one-hot placement
    (see ``_make_onehot_kernel``). ``chunk``/``rows`` are microbench knobs."""
    chunk = chunk or ONEHOT_CHUNK
    rows = rows or ONEHOT_ROWS
    # pillar ids ride an f32 lane (and cast f32->i32 in-kernel): exact only
    # for ids < 2^24 — fail loudly instead of corrupting placement
    assert h * w < 1 << 24, f"grid {h}x{w} overflows the f32 pillar-id lane (>= 2^24)"
    b, n, c = feats_sorted.shape
    if n % chunk:
        pad_n = chunk - n % chunk
        feats_sorted = jnp.pad(feats_sorted, ((0, 0), (0, pad_n), (0, 0)))
        pids_sorted = jnp.pad(pids_sorted, ((0, 0), (0, pad_n)), constant_values=h * w)
        n = n + pad_n
    rows_per_tile = rows
    while h % rows_per_tile != 0:
        rows_per_tile -= 1
    t = h // rows_per_tile
    rw = rows_per_tile * w

    # lane c carries the pillar id as f32 (exact: ids < 2^24) — no SMEM path
    c_pad = -(-(c + 1) // 128) * 128
    boundaries = jnp.arange(t + 1, dtype=jnp.int32) * rw
    starts = jax.vmap(lambda p: jnp.searchsorted(p, boundaries, side="left"))(
        pids_sorted
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N, C+) feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, ti, s: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, c_pad), feats_sorted.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    feats_flat = feats_sorted.reshape(b * n, c)
    feats_flat = jnp.pad(feats_flat, ((0, 0), (0, c_pad - c)))
    feats_flat = feats_flat.at[:, c].set(pids_sorted.reshape(-1).astype(feats_sorted.dtype))
    out = pl.pallas_call(
        _make_onehot_kernel(n, rw, c, chunk),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), feats_sorted.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, feats_flat)
    return out.reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _bev_scatter_max_runs_impl(feats_sorted, pids_sorted, h, w, interpret=False):
    """Same contract as :func:`_bev_scatter_max_impl`; register-accumulated
    run stores (see ``_make_runs_kernel``)."""
    b, n, c = feats_sorted.shape
    chunk = CHUNK  # full chunks only: SMEM DMA slice alignment (see above)
    if n % chunk:
        pad_n = chunk - n % chunk
        feats_sorted = jnp.pad(feats_sorted, ((0, 0), (0, pad_n), (0, 0)))
        pids_sorted = jnp.pad(pids_sorted, ((0, 0), (0, pad_n)), constant_values=h * w)
        n = n + pad_n
    rows_per_tile = max(1, min(32, 2 * 1024 * 1024 // max(w * c * 4, 1)))
    while h % rows_per_tile != 0:
        rows_per_tile -= 1
    t = h // rows_per_tile
    rw = rows_per_tile * w

    c_pad = -(-c // 128) * 128
    boundaries = jnp.arange(t + 1, dtype=jnp.int32) * rw
    starts = jax.vmap(lambda p: jnp.searchsorted(p, boundaries, side="left"))(
        pids_sorted
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) ids in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N, C) feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, ti, s: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, c_pad), feats_sorted.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, c), feats_sorted.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    feats_flat = feats_sorted.reshape(b * n, c)
    if c_pad != c:
        feats_flat = jnp.pad(feats_flat, ((0, 0), (0, c_pad - c)))
    out = pl.pallas_call(
        _make_runs_kernel(n, rw, c, chunk),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), feats_sorted.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, pids_sorted.reshape(-1), feats_flat)
    return out.reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _bev_scatter_max_tails_impl(feats_sorted, pids_sorted, tails, h, w, interpret=False):
    """Like :func:`_bev_scatter_max_impl` with a per-row tail flag; only tail
    rows (which carry the full segment max) are stored."""
    b, n, c = feats_sorted.shape
    chunk = CHUNK  # full chunks only: SMEM DMA slice alignment (see above)
    if n % chunk:
        pad_n = chunk - n % chunk
        feats_sorted = jnp.pad(feats_sorted, ((0, 0), (0, pad_n), (0, 0)))
        pids_sorted = jnp.pad(pids_sorted, ((0, 0), (0, pad_n)), constant_values=h * w)
        tails = jnp.pad(tails, ((0, 0), (0, pad_n)))
        n = n + pad_n
    rows_per_tile = max(1, min(32, 2 * 1024 * 1024 // max(w * c * 4, 1)))
    while h % rows_per_tile != 0:
        rows_per_tile -= 1
    t = h // rows_per_tile
    rw = rows_per_tile * w

    c_pad = -(-c // 128) * 128
    boundaries = jnp.arange(t + 1, dtype=jnp.int32) * rw
    starts = jax.vmap(lambda p: jnp.searchsorted(p, boundaries, side="left"))(
        pids_sorted
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) ids in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) tail flags in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N, C) feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, ti, s: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, c_pad), feats_sorted.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    feats_flat = feats_sorted.reshape(b * n, c)
    if c_pad != c:
        feats_flat = jnp.pad(feats_flat, ((0, 0), (0, c_pad - c)))
    out = pl.pallas_call(
        _make_tails_kernel(n, rw, c, chunk),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), feats_sorted.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, pids_sorted.reshape(-1), tails.reshape(-1), feats_flat)
    return out.reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _bev_scatter_max_fused_impl(feats_sorted, pids_sorted, h, w, interpret=False):
    """Same contract as :func:`_bev_scatter_max_impl`; the segment reduction
    happens in-kernel (see ``_make_fused_kernel``)."""
    # pillar ids ride an f32 lane in-kernel: exact only for ids < 2^24
    assert h * w < 1 << 24, f"grid {h}x{w} overflows the f32 pillar-id lane (>= 2^24)"
    b, n, c = feats_sorted.shape
    chunk = CHUNK  # full chunks only: SMEM DMA slice alignment (see above)
    if n % chunk:
        pad_n = chunk - n % chunk
        feats_sorted = jnp.pad(feats_sorted, ((0, 0), (0, pad_n), (0, 0)))
        pids_sorted = jnp.pad(pids_sorted, ((0, 0), (0, pad_n)), constant_values=h * w)
        n = n + pad_n
    # tail rows: last row of each segment, plus a forced tail at every chunk
    # boundary so cross-chunk segments contribute per-chunk partial maxima
    nxt = jnp.pad(pids_sorted[:, 1:], ((0, 0), (0, 1)), constant_values=-1)
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    tails = ((pids_sorted != nxt) | (col % chunk == chunk - 1)).astype(jnp.int32)

    rows_per_tile = max(1, min(32, 2 * 1024 * 1024 // max(w * c * 4, 1)))
    while h % rows_per_tile != 0:
        rows_per_tile -= 1
    t = h // rows_per_tile
    rw = rows_per_tile * w

    # lane c carries the pillar id as f32 (see kernel docstring); always keep
    # at least one pad lane free for it
    c_pad = -(-(c + 1) // 128) * 128
    boundaries = jnp.arange(t + 1, dtype=jnp.int32) * rw
    starts = jax.vmap(lambda p: jnp.searchsorted(p, boundaries, side="left"))(
        pids_sorted
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) ids in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N,) tail flags in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # flat (B*N, C+) feats in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, ti, s: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, c_pad), feats_sorted.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    feats_flat = feats_sorted.reshape(b * n, c)
    feats_flat = jnp.pad(feats_flat, ((0, 0), (0, c_pad - c)))
    feats_flat = feats_flat.at[:, c].set(pids_sorted.reshape(-1).astype(feats_sorted.dtype))
    out = pl.pallas_call(
        _make_fused_kernel(n, rw, c, chunk),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), feats_sorted.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts,
        pids_sorted.reshape(-1),
        tails.reshape(-1),
        feats_flat,
    )
    return out.reshape(b, h, w, c)


def use_interpret():
    """Pallas TPU kernels need a TPU; interpret elsewhere (tests on CPU)."""
    return jax.default_backend() not in ("tpu", "axon")
