"""Collect the synthetic-world experiment results into one table.

Usage:
    python workspace/collect_results.py [tag]            # print markdown table
    python workspace/collect_results.py [tag] --export   # + write results/{tag}/
                                                          # (tracked artifacts)

Reads ``metrics.json`` (fallback: the newest eval log) under every
``eval/<eval_tag>/`` directory produced by workspace/synth_experiments.sh and
prints the README markdown table with sync AND async columns (the reference
table shape, README.md:44-54), the flow-propagation ablation, the oracle
(sender-GT) exchange ablation, the weighted-NMS late-fusion variant, and the
DiscoNet matched-/cross-training cells.

``--export`` copies each row's metrics.json + eval log (+ the train log where
one exists) into ``results/{tag}/{row}/`` and writes ``matrix.md`` /
``matrix.json`` — the committed, independently verifiable provenance of the
README numbers (reference output-tree pattern: tools/train.py:91-94).
"""
import json
import re
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
args = [a for a in sys.argv[1:] if not a.startswith("-")]
TAG = args[0] if args else "synurb"
EXPORT = "--export" in sys.argv

# label -> (cfg, {column: (train_tag, eval_tag)})
MATRIX = [
    ("single-agent ego (no collaboration)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG + "_nocollab", "single"), "async": None}),
    ("late fusion", "v2x_late_fusion",
     {"sync": (TAG, "late_sync"), "async": (TAG, "late_async"),
      "async w/o flow": (TAG, "late_async_noflow")}),
    ("late fusion (weighted box fusion)", "v2x_late_fusion",
     {"sync": (TAG, "late_sync_wnms"), "async": (TAG, "late_async_wnms")}),
    ("late fusion (oracle flow)", "v2x_late_fusion",
     {"sync": None, "async": (TAG, "late_async_oracleflow")}),
    ("mid fusion (DiscoNet, matched train)", "v2x_pointpillar_disco",
     {"sync": (TAG + "_dsync", "disco_sync"), "async": (TAG, "disco_async")}),
    ("mid fusion (DiscoNet, cross: async-trained@sync / sync-trained@async)",
     "v2x_pointpillar_disco",
     {"sync": (TAG, "disco_xsync"), "async": (TAG + "_dsync", "disco_xasync")}),
    ("early fusion", "v2x_pointpillar_basic_ego_early",
     {"sync": (TAG + "_sync", "early_sync"), "async": (TAG + "_async", "early_async")}),
    ("lately fusion (MoDAR, ours)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG, "lately_sync"), "async": (TAG, "lately_async"),
      "async w/o flow": (TAG, "lately_async_noflow")}),
    ("lately fusion (oracle senders)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG + "_oracle", "lately_oracle_sync"),
      "async": (TAG + "_oracle", "lately_oracle_async")}),
    # eval-only oracle swap: the REAL-sender-trained ego fed the oracle
    # exchange DB — isolates the input-side sender-quality effect from ego
    # retraining noise (one set of ego weights, two input qualities)
    ("lately fusion (oracle senders, eval-only swap)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG, "lately_oracleswap_sync"),
      "async": (TAG, "lately_oracleswap_async")}),
    # lossy-broadcast robustness: p(drop each agent's message) at eval time
    ("lately fusion (broadcast dropout p=0.2)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG, "lately_drop02_sync"), "async": (TAG, "lately_drop02_async")}),
    ("lately fusion (broadcast dropout p=0.5)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG, "lately_drop05_sync"), "async": (TAG, "lately_drop05_async")}),
    ("lately fusion (loose broadcast: thresh 0.03, 200 boxes)", "v2x_pointpillar_basic_ego",
     {"sync": (TAG + "_loose", "lately_loose_sync"),
      "async": (TAG + "_loose", "lately_loose_async")}),
]
EXTRA = [
    ("per-agent car detector (own-view GT — not comparable to rows above)",
     "v2x_pointpillar_basic_car", (TAG, "car")),
]

# seed repeats of the pivotal pair (independent retrains; the world and eval
# split are identical — only init/shuffle/augmentation stochasticity varies).
# label -> (cfg, {seed_name: {column: (train_tag, eval_tag)}})
SEED_REPEATS = [
    ("lately fusion (MoDAR, ours)", "v2x_pointpillar_basic_ego", {
        "base": {"sync": (TAG, "lately_sync"), "async": (TAG, "lately_async")},
        "s101": {"sync": (TAG + "_s101", "lately_sync_s101"),
                 "async": (TAG + "_s101", "lately_async_s101")},
        "s202": {"sync": (TAG + "_s202", "lately_sync_s202"),
                 "async": (TAG + "_s202", "lately_async_s202")},
    }),
    ("early fusion", "v2x_pointpillar_basic_ego_early", {
        "base": {"sync": (TAG + "_sync", "early_sync")},
        "s101": {"sync": (TAG + "_sync_s101", "early_sync_s101")},
        "s202": {"sync": (TAG + "_sync_s202", "early_sync_s202")},
    }),
]


def seed_spread_lines():
    """mean ± half-range over available seed repeats, per column."""
    out = []
    for label, cfg, seeds in SEED_REPEATS:
        cols = {}
        for sname, colmap in seeds.items():
            for col, (tt, et) in colmap.items():
                r = read_results(cfg, tt, et)
                if r is not None:
                    cols.setdefault(col, []).append((sname, 100 * r[0]))
        for col, vals in sorted(cols.items()):
            if len(vals) < 2:
                continue
            xs = [v for _, v in vals]
            mean = sum(xs) / len(xs)
            half = (max(xs) - min(xs)) / 2
            detail = ", ".join(f"{s}={v:.1f}" for s, v in vals)
            out.append(f"- {label} [{col}]: mAP {mean:.1f} ± {half:.1f} "
                       f"(n={len(xs)}: {detail})")
    return out


def _eval_dir(cfg, train_tag, eval_tag):
    d = ROOT / "output/cfgs/v2x_sim_models" / cfg / train_tag / "eval"
    return d / eval_tag if eval_tag and eval_tag != "default" else d


def read_results(cfg, train_tag, eval_tag):
    """(mAP, NDS, recall@0.3) or None."""
    d = _eval_dir(cfg, train_tag, eval_tag)
    mj = d / "metrics.json"
    if mj.exists():
        with open(mj) as f:
            m = json.load(f)
        return (m.get("mAP", float("nan")), m.get("NDS", float("nan")),
                m.get("recall/rcnn_0.3", float("nan")))
    logs = sorted(d.glob("log_eval_*.txt"))
    if not logs:
        return None
    text = logs[-1].read_text()
    mm = re.findall(r"result_dict: ({.*})", text)
    if not mm:
        return None
    dd = mm[-1]
    map_ = re.search(r"'mAP': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    nds = re.search(r"'NDS': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    rec = re.search(r"'recall/rcnn_0\.3': (?:np\.float64\()?([0-9.eE+-]+)", dd)
    return tuple(float(x.group(1)) if x else float("nan") for x in (map_, nds, rec))


def fmt(r):
    return "—" if r is None else f"{100*r[0]:.1f}"


def _export_row(out_root, cfg, train_tag, eval_tag):
    d = _eval_dir(cfg, train_tag, eval_tag)
    if not d.exists():
        return
    dst = out_root / f"{cfg}__{train_tag}__{eval_tag}"
    dst.mkdir(parents=True, exist_ok=True)
    for f in list(d.glob("metrics.json")) + sorted(d.glob("log_eval_*.txt"))[-1:]:
        shutil.copy2(f, dst / f.name)
    train_dir = ROOT / "output/cfgs/v2x_sim_models" / cfg / train_tag
    for f in sorted(train_dir.glob("log_train_*.txt"))[-1:]:
        shutil.copy2(f, dst / f.name)
    for f in train_dir.glob("*.yaml"):  # the exact config the run used
        shutil.copy2(f, dst / f.name)


def main():
    lines = ["| collab method | sync mAP | async mAP | async w/o flow | NDS[ATE,ASE,AOE] (sync) | recall@0.3 (sync) |",
             "|---|---|---|---|---|---|"]
    table = {}
    for label, cfg, cols in MATRIX:
        res = {}
        for col, spec in cols.items():
            res[col] = read_results(cfg, spec[0], spec[1]) if spec else None
        table[label] = {
            c: (None if r is None else {"mAP": r[0], "NDS": r[1], "recall_0.3": r[2]})
            for c, r in res.items()
        }
        sync = res.get("sync")
        any_nds = sync or res.get("async")
        lines.append(
            f"| {label} | {fmt(sync)} | {fmt(res.get('async'))} | "
            f"{fmt(res.get('async w/o flow'))} | "
            f"{'—' if sync is None else f'{100*sync[1]:.1f}'} | "
            f"{'—' if sync is None else f'{sync[2]:.2f}'} |")
    spread = seed_spread_lines()
    if spread:
        lines += ["", "Seed repeats (mean ± half-range over independent retrains):"]
        lines += spread
    print("\n".join(lines))
    print()
    for label, cfg, (tag, etag) in EXTRA:
        r = read_results(cfg, tag, etag)
        if r is not None:
            line = (f"{label}: mAP {100*r[0]:.1f}, NDS[ATE,ASE,AOE] {100*r[1]:.1f}, "
                    f"recall@0.3 {r[2]:.2f}")
            mj = _eval_dir(cfg, tag, etag) / "metrics.json"
            if mj.exists():
                m = json.load(open(mj))
                if "car_AOE" in m:
                    # the round-4 mechanism metric: heading error of the
                    # sender detector (1.596 = random on the flip-symmetric
                    # world; the VF+car_profile fix should drop it to the
                    # single-agent ~0.59 scale)
                    line += (f", ATE {m.get('car_ATE', float('nan')):.3f}"
                             f", AOE {m['car_AOE']:.3f}")
            print(line)

    if EXPORT:
        out_root = ROOT / "results" / TAG
        out_root.mkdir(parents=True, exist_ok=True)
        for label, cfg, cols in MATRIX:
            for col, spec in cols.items():
                if spec:
                    _export_row(out_root, cfg, spec[0], spec[1])
        for label, cfg, (tag, etag) in EXTRA:
            _export_row(out_root, cfg, tag, etag)
        for label, cfg, seeds in SEED_REPEATS:
            for colmap in seeds.values():
                for tt, et in colmap.values():
                    _export_row(out_root, cfg, tt, et)
        (out_root / "matrix.md").write_text("\n".join(lines) + "\n")
        with open(out_root / "matrix.json", "w") as f:
            json.dump(table, f, indent=1)
        print(f"\nexported -> {out_root}")


if __name__ == "__main__":
    main()
