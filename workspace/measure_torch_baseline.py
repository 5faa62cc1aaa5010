"""Measure the CUDA-reference-equivalent torch pipeline on this host's CPU.

The reference publishes no throughput number (its eval logs only
sec_per_example on an RTX A6000), and no CUDA device exists in this
environment. This script produces the one baseline measurement that IS
reproducible here: the torch CenterPoint-pillar stack (the vendored
reference-equivalent model from tests/torch_ref_model.py — same layers,
widths and data layout as /root/reference's flagship
`v2x_pointpillar_basic_*` configs) timed end-to-end on CPU with the exact
synthetic batch distribution bench.py uses.

BASELINE.md combines this measured CPU floor with cited GPU benchmarks of the
same architecture family to bound the A6000 number bench.py compares against.

Usage: python workspace/measure_torch_baseline.py [--iters 4] [--batch 8]
Prints one JSON line {"torch_cpu_clouds_per_s": ..., "threads": ...}.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--npoints", type=int, default=32768)
    args = parser.parse_args()

    import torch

    torch.set_num_threads(torch.get_num_threads())  # all cores
    from torch_ref_model import TorchCenterPointPillar

    from pcp_tpu.config import CfgDict, cfg_from_yaml_file

    cfg = CfgDict()
    cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
    pc_range = tuple(cfg.DATA_CONFIG["POINT_CLOUD_RANGE"])
    voxel = (0.2, 0.2, 8.0)
    grid = (int(round((pc_range[3] - pc_range[0]) / voxel[0])),
            int(round((pc_range[4] - pc_range[1]) / voxel[1])), 1)
    num_raw = 13  # ego flagship point width

    model = TorchCenterPointPillar(
        cfg.MODEL, grid_size=grid, pc_range=pc_range, voxel_size=voxel,
        num_raw=num_raw, num_class=1).eval()

    rng = np.random.default_rng(0)
    centers = rng.uniform(-45, 45, size=(args.batch, 64, 2))
    idx = rng.integers(0, 64, size=args.npoints)
    pts = np.zeros((args.batch, args.npoints, num_raw), dtype=np.float32)
    pts[..., 0:2] = centers[:, idx, :] + rng.normal(0, 3.0, (args.batch, args.npoints, 2))
    pts[..., 2] = rng.uniform(-3.0, -0.5, (args.batch, args.npoints))
    # the vendored torch VFE (like the reference's) assumes in-range points —
    # range masking happens in the reference's dataloader
    pts[..., 0] = np.clip(pts[..., 0], pc_range[0], pc_range[3] - 1e-3)
    pts[..., 1] = np.clip(pts[..., 1], pc_range[1], pc_range[4] - 1e-3)
    points_list = [torch.from_numpy(p) for p in pts]

    with torch.no_grad():
        model(points_list)  # warmup
        t0 = time.time()
        for _ in range(args.iters):
            model(points_list)
        dt = time.time() - t0
    pcs = args.iters * args.batch / dt
    print(json.dumps({
        "torch_cpu_clouds_per_s": round(pcs, 2),
        "threads": torch.get_num_threads(),
        "grid": grid, "batch": args.batch, "npoints": args.npoints,
    }))


if __name__ == "__main__":
    main()
