"""Export a weights-only checkpoint for the committed bench default.

Strips the optimizer state from a training checkpoint (params + batch_stats
only, ~4x smaller) and writes it where ``bench.py`` auto-discovers it
(``results/bench_ckpt``), so the driver-captured perf number runs trained
heads — realistic detection/NMS occupancy — by default.

Usage: python tools/export_bench_ckpt.py --ckpt output/.../checkpoint_epoch_30 \
           [--out results/bench_ckpt]
"""
import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", default="results/bench_ckpt")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from pcp_tpu.train.checkpoint import load_params_from_file

    variables = load_params_from_file(args.ckpt)
    out = Path(args.out).absolute()
    if out.exists():
        shutil.rmtree(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": variables["params"], "batch_stats": variables["batch_stats"]})
    ckptr.wait_until_finished()
    print(f"bench checkpoint exported -> {out}")


if __name__ == "__main__":
    main()
