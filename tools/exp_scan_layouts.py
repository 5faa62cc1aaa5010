"""One-off TPU experiments: scan layout, sort packing, kernel unroll."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
BATCH, N = 8, 32768
ITERS = 16


def timed(fn, inputs, name):
    import jax
    import jax.numpy as jnp

    r = fn(*inputs[0])
    jax.tree_util.tree_map(lambda x: np.asarray(x), r)
    trivial = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    _ = np.asarray(trivial(jnp.zeros(())))
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            r = fn(*inputs[i % len(inputs)])
        leaf = jax.tree_util.tree_leaves(r)[0]
        _ = np.asarray(jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {max(best - rtt, 0) / ITERS * 1e3:8.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from pcp_tpu.ops.sorted_segments import _seg_scan

    rng = np.random.default_rng(0)
    pid = np.sort(
        rng.integers(0, 512 * 512, size=(2, BATCH, N)).astype(np.int32), axis=-1
    )
    vals4 = rng.uniform(0, 1, size=(2, BATCH, N, 4)).astype(np.float32)
    vals32 = rng.uniform(0, 1, size=(2, BATCH, N, 32)).astype(np.float32)

    which = sys.argv[1:] or ["scans", "sort", "unroll"]

    if "scans" in which:
        f4 = jax.jit(lambda p, v: _seg_scan(v, p, jnp.add))
        timed(f4, [(jnp.asarray(pid[i]), jnp.asarray(vals4[i])) for i in range(2)], "seg_scan C=4 (N-sublane layout)")
        f32 = jax.jit(lambda p, v: _seg_scan(v, p, jnp.maximum))
        timed(f32, [(jnp.asarray(pid[i]), jnp.asarray(vals32[i])) for i in range(2)], "seg_scan C=32 (N-sublane layout)")
        f2d = jax.jit(lambda p: _seg_scan(jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], p.shape), p, jnp.maximum))
        timed(f2d, [(jnp.asarray(pid[i]),) for i in range(2)], "seg_scan 2-D (N-lane layout, end_idx)")

        # transposed: (B, C, N) with N in lanes; pid broadcast along C
        def scan_t(p, v):  # v: (B, N, C)
            vt = jnp.transpose(v, (0, 2, 1))  # (B, C, N)
            pt = jnp.broadcast_to(p[:, None, :], vt.shape)
            out = _seg_scan(vt.reshape(-1, N)[:, :], pt.reshape(-1, N), jnp.add)
            return jnp.transpose(out.reshape(vt.shape), (0, 2, 1))

        ft = jax.jit(scan_t)
        timed(ft, [(jnp.asarray(pid[i]), jnp.asarray(vals4[i])) for i in range(2)], "seg_scan C=4 transposed (N-lane)")
        # numerics check
        a = np.asarray(f4(jnp.asarray(pid[0]), jnp.asarray(vals4[0])))
        b = np.asarray(ft(jnp.asarray(pid[0]), jnp.asarray(vals4[0])))
        print("transposed matches:", np.allclose(a, b, atol=1e-5), flush=True)

        ft32 = jax.jit(lambda p, v: jnp.transpose(
            _seg_scan(
                jnp.transpose(v, (0, 2, 1)).reshape(-1, N),
                jnp.broadcast_to(p[:, None, :], (p.shape[0], v.shape[-1], N)).reshape(-1, N),
                jnp.maximum,
            ).reshape(p.shape[0], v.shape[-1], N),
            (0, 2, 1),
        ))
        timed(ft32, [(jnp.asarray(pid[i]), jnp.asarray(vals32[i])) for i in range(2)], "seg_scan C=32 transposed (N-lane)")

    if "sort" in which:
        pts = rng.uniform(-50, 50, size=(2, BATCH, N, 14)).astype(np.float32)
        pid_u = rng.integers(0, 512 * 512, size=(2, BATCH, N)).astype(np.int32)

        from pcp_tpu.ops.sorted_segments import sort_by_pid

        f_cur = jax.jit(lambda p, x: sort_by_pid(p, [x]))
        timed(f_cur, [(jnp.asarray(pid_u[i]), jnp.asarray(pts[i])) for i in range(2)], "sort: argsort + take_along (14ch)")

        def f_packed(p, x):
            key = p.astype(jnp.int64) * N + jnp.arange(N, dtype=jnp.int64)[None, :]
            key = jnp.sort(key, axis=-1)
            order = (key % N).astype(jnp.int32)
            pid_s = (key // N).astype(jnp.int32)
            return pid_s, jnp.take_along_axis(x, order[..., None], axis=1)

        fp = jax.jit(f_packed)
        timed(fp, [(jnp.asarray(pid_u[i]), jnp.asarray(pts[i])) for i in range(2)], "sort: int64 pack + take_along (14ch)")

        def f_lax(p, x):
            out = jax.lax.sort((p, x), dimension=1, num_keys=1)
            return out

        fl = jax.jit(f_lax)
        timed(fl, [(jnp.asarray(pid_u[i]), jnp.asarray(pts[i])) for i in range(2)], "sort: lax.sort 2-operand payload 14ch")

    if "unroll" in which:
        import pcp_tpu.ops.pallas.bev_scatter as bs

        feats = rng.uniform(0, 1, size=(2, BATCH, N, 64)).astype(np.float32)
        pid_s = np.sort(pid, axis=-1)
        f = jax.jit(lambda x, p: bs.bev_scatter_max_sorted(x, p, 512, 512, False))
        timed(f, [(jnp.asarray(feats[i]), jnp.asarray(pid[i])) for i in range(2)], "pallas kernel (current)")


if __name__ == "__main__":
    main()
