"""Collect the synthetic-world experiment results into one table.

Usage: python workspace/collect_results.py [tag]   (default: synurb)

Reads the newest eval log under every ``eval/<eval_tag>/`` directory produced
by workspace/synth_experiments.sh and prints the README markdown table with
sync AND async columns (the reference table shape, README.md:44-54) plus the
flow-propagation ablation rows.
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TAG = sys.argv[1] if len(sys.argv) > 1 else "synurb"

# label -> (cfg, train_tag, {column: eval_tag})
MATRIX = [
    ("single-agent ego (no collaboration)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG + "_nocollab", "single"), "async": None}),
    ("late fusion", "v2x_late_fusion",
     {"sync": (TAG, "late_sync"), "async": (TAG, "late_async"),
      "async w/o flow": (TAG, "late_async_noflow")}),
    ("mid fusion (DiscoNet)", "v2x_pointpillar_disco",
     {"sync": (TAG, "disco_sync"), "async": (TAG, "disco_async")}),
    ("early fusion", "v2x_pointpillar_basic_ego_early",
     {"sync": (TAG + "_sync", "early_sync"), "async": (TAG + "_async", "early_async")}),
    ("lately fusion (MoDAR, ours)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG, "lately_sync"), "async": (TAG, "lately_async"),
      "async w/o flow": (TAG, "lately_async_noflow")}),
]
EXTRA = [
    ("per-agent car detector (own-view GT — not comparable to rows above)",
     "v2x_pointpillar_basic_car", (TAG, "car")),
]


def read_results(cfg, train_tag, eval_tag):
    d = ROOT / "output/cfgs/v2x_sim_models" / cfg / train_tag / "eval"
    if eval_tag and eval_tag != "default":
        d = d / eval_tag
    logs = sorted(d.glob("log_eval_*.txt"))
    if not logs:
        return None
    text = logs[-1].read_text()
    m = re.findall(r"result_dict: ({.*})", text)
    if not m:
        return None
    dd = m[-1]
    map_ = re.search(r"'mAP': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    nds = re.search(r"'NDS': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    rec = re.search(r"'recall/rcnn_0\.3': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    return tuple(float(x.group(1)) if x else float("nan") for x in (map_, nds, rec))


def fmt(r):
    return "—" if r is None else f"{100*r[0]:.1f}"


def main():
    print("| collab method | sync mAP | async mAP | async w/o flow | NDS[ATE,ASE,AOE] (sync) | recall@0.3 (sync) |")
    print("|---|---|---|---|---|---|")
    for label, cfg, cols in MATRIX:
        res = {}
        for col, spec in cols.items():
            res[col] = read_results(cfg, spec[0], spec[1]) if spec else None
        sync = res.get("sync")
        print(f"| {label} | {fmt(sync)} | {fmt(res.get('async'))} | "
              f"{fmt(res.get('async w/o flow'))} | "
              f"{'—' if sync is None else f'{100*sync[1]:.1f}'} | "
              f"{'—' if sync is None else f'{sync[2]:.2f}'} |")
    print()
    for label, cfg, (tag, etag) in EXTRA:
        r = read_results(cfg, tag, etag)
        if r is not None:
            print(f"{label}: mAP {100*r[0]:.1f}, NDS[ATE,ASE,AOE] {100*r[1]:.1f}, "
                  f"recall@0.3 {r[2]:.2f}")


if __name__ == "__main__":
    main()
