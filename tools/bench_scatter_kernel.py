"""Microbench: BEV scatter kernel variants on the real chip.

Times bev_scatter_max_sorted (per-point RMW), _prereduced (XLA scan + tail
stores) and _fused (in-kernel sweep + tail stores) at clustered (~1 pt/pillar)
and realistic (~8 pts/pillar) occupancy. b8 x 32768 x 64ch, 512x512 grid.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from pcp_tpu.ops.pallas.bev_scatter import (
    _bev_scatter_max_onehot_impl,
    bev_scatter_max_sorted,
    bev_scatter_max_sorted_fused,
    bev_scatter_max_sorted_onehot,
    bev_scatter_max_sorted_prereduced,
)

B, N, C, H, W = 8, 32768, 64, 512, 512


def make_inputs(occupancy, seed=0):
    rng = np.random.default_rng(seed)
    if occupancy == "realistic":
        n_pillars = 4096
        cells = rng.choice(H * W, size=n_pillars, replace=False)
        pid = cells[rng.integers(0, n_pillars, size=(B, N))]
    else:
        pid = rng.integers(0, H * W, size=(B, N))
    pid = np.sort(pid.astype(np.int32), axis=1)
    pid[:, -1000:] = H * W  # padding tail
    feats = np.abs(rng.normal(size=(B, N, C))).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(pid)


def timeit(fn, feats, pid, iters=20):
    out = fn(feats, pid, H, W, False)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(feats, pid, H, W, False)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


for occ in ("clustered", "realistic"):
    feats, pid = make_inputs(occ)
    ref = np.asarray(bev_scatter_max_sorted(feats, pid, H, W, False))
    got = np.asarray(bev_scatter_max_sorted_fused(feats, pid, H, W, False))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    print(f"[{occ}] parity ok")
    got = np.asarray(bev_scatter_max_sorted_onehot(feats, pid, H, W, False))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    print(f"[{occ}] onehot parity ok")
    for name, fn in (
        ("per-point RMW", bev_scatter_max_sorted),
        ("prereduced   ", bev_scatter_max_sorted_prereduced),
        ("fused        ", bev_scatter_max_sorted_fused),
        ("onehot       ", bev_scatter_max_sorted_onehot),
    ):
        print(f"[{occ}] {name}: {timeit(fn, feats, pid):7.2f} ms")
    for chunk, rows in ((128, 1), (128, 2), (256, 1), (256, 2), (256, 4), (512, 2), (512, 4)):
        fn = lambda f, p, h, w, i: _bev_scatter_max_onehot_impl(
            f, p, h, w, i, chunk=chunk, rows=rows)
        # parity at THESE knobs before timing: a combination that miscompiles
        # must not look like a valid tuning candidate
        np.testing.assert_allclose(np.asarray(fn(feats, pid, H, W, False)), ref, atol=2e-6)
        print(f"[{occ}] onehot c{chunk} r{rows}: {timeit(fn, feats, pid):7.2f} ms")
