"""Collect the synthetic-world experiment results into one table.

Usage: python workspace/collect_results.py [tag]   (default: synfull)

Reads the newest eval log of every config/tag produced by
workspace/synth_experiments.sh and prints a markdown table (mAP / NDS /
recall@0.3) for the README results section.
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TAG = sys.argv[1] if len(sys.argv) > 1 else "synfull"
ROWS = [
    ("single-agent ego (no collaboration)", "v2x_pointpillar_basic_ego", TAG + "_nocollab"),
    ("single-agent car detector", "v2x_pointpillar_basic_car", TAG),
    ("early fusion (all agents' raw points)", "v2x_pointpillar_basic_ego_early", TAG),
    ("late fusion over 5 trained agents", "v2x_late_fusion", TAG),
    ("lately fusion (MoDAR, ours) — no BN recal", "v2x_pointpillar_basic_ego", TAG + "#norecal"),
    ("lately fusion (MoDAR, ours)", "v2x_pointpillar_basic_ego", TAG),
]


def newest_results(cfg, tag):
    """(mAP, NDS, recall@0.3) of the newest eval log for cfg/tag; the #norecal
    marker selects the second-newest log (the script runs norecal first)."""
    idx = 0
    if tag.endswith("#norecal"):
        tag = tag.split("#")[0]
        idx = 1
    logs = sorted((ROOT / "output/cfgs/v2x_sim_models" / cfg / tag / "eval").glob(
        "log_eval_*.txt"))
    if not logs:
        return None
    picks = logs[::-1]
    if idx >= len(picks):
        return None
    text = picks[idx].read_text()
    m = re.findall(r"result_dict: ({.*})", text)
    if not m:
        return None
    d = m[-1]
    map_ = re.search(r"'mAP': (?:np\.float64\()?([0-9.eE+-]+)", d)
    nds = re.search(r"'NDS': (?:np\.float64\()?([0-9.eE+-]+)", d)
    rec = re.search(r"'recall/rcnn_0\.3': (?:np\.float64\()?([0-9.eE+-]+)", d)
    return tuple(float(x.group(1)) if x else float("nan") for x in (map_, nds, rec))


def main():
    print("| pipeline | mAP | NDS | recall@0.3 |")
    print("|---|---|---|---|")
    for label, cfg, tag in ROWS:
        r = newest_results(cfg, tag)
        if r is None:
            print(f"| {label} | — | — | — |")
        else:
            print(f"| {label} | {100*r[0]:.1f} | {100*r[1]:.1f} | {r[2]:.2f} |")


if __name__ == "__main__":
    main()
