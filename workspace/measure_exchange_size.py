"""Bandwidth measurement: average MB/sample exchanged per fusion mode.

Counterpart of /root/reference/workspace/measure_exchange_size.py:15-96 —
produces the README bandwidth column:
  * early fusion: all other agents' raw points (float32 bytes);
  * late/lately fusion: MoDAR rows (+ foreground rows) from the exchange DB;
  * mid fusion (DiscoNet): the compressed BEV tensors each agent broadcasts.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.utils.common_utils import create_logger

_REPO = Path(__file__).resolve().parent.parent


def measure_early(cfg_overrides=None, max_samples=32):
    cfg = CfgDict()
    cfg_from_yaml_file(str(_REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego_early.yaml"), cfg)
    if cfg_overrides:
        cfg.DATA_CONFIG.update(cfg_overrides)
    ds, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1,
                                     training=False, logger=create_logger(), workers=0)
    sizes = []
    for i, batch in enumerate(loader):
        meta = batch["metadata"][0]
        n_exchanged = sum(meta["exchange"].values())
        sizes.append(n_exchanged * 7 * 4)  # 7 float32 features/point
        if i + 1 >= max_samples:
            break
    return float(np.mean(sizes)) / 1e6 if sizes else 0.0


def measure_lately(cfg_overrides=None, max_samples=32):
    cfg = CfgDict()
    cfg_from_yaml_file(str(_REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml"), cfg)
    if cfg_overrides:
        cfg.DATA_CONFIG.update(cfg_overrides)
    ds, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1,
                                     training=False, logger=create_logger(), workers=0)
    sizes_late, sizes_lately = [], []
    for i, batch in enumerate(loader):
        meta = batch["metadata"][0]
        n_fg = sum(v[0] for v in meta["exchange"].values())
        n_modar = sum(v[1] for v in meta["exchange"].values())
        # late fusion broadcasts only the boxes (9 float32/row). lately:
        # under the boxflow wire format (n_fg == 0) each box carries its
        # pooled flow (12 floats/row); a legacy database ships the full
        # foreground point set (13 float32/row, hunter_jr.py:377-397)
        sizes_late.append(n_modar * 9 * 4)
        if n_fg == 0:
            sizes_lately.append(n_modar * 12 * 4)
        else:
            sizes_lately.append(n_modar * 9 * 4 + n_fg * 13 * 4)
        if i + 1 >= max_samples:
            break
    mb = lambda s: float(np.mean(s)) / 1e6 if s else 0.0
    return mb(sizes_late), mb(sizes_lately)


def measure_mid(bev_channels=384, bev_hw=128):
    # reference protocol (measure_exchange_size.py:60-72): average bytes of ONE
    # agent's broadcast bev_img tensor — the BEVMaker backbone output
    # (384 ch at stride-4 128x128 -> 25.17 MB, matching ref README.md:52's
    # 25.16); compression to 128 ch happens ego-side inside the fusion module
    return bev_hw * bev_hw * bev_channels * 4 / 1e6


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--set", dest="set_pairs", nargs="*", default=[],
                        help="DATA_CONFIG key/value override pairs (literal-eval), "
                             "e.g. --set SYNTHETIC \"{'WORLD': 'urban'}\"")
    parser.add_argument("--json", default=None,
                        help="also write the measurements to this JSON file "
                             "(committed artifact: the README bandwidth column)")
    args = parser.parse_args()
    overrides = {"USE_SYNTHETIC_DATA": True} if args.synthetic else {}
    if args.set_pairs:
        import ast

        assert len(args.set_pairs) % 2 == 0, "--set takes key value pairs"
        for k, v in zip(args.set_pairs[::2], args.set_pairs[1::2]):
            try:
                overrides[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                overrides[k] = v
    overrides = overrides or None
    late_mb, lately_mb = measure_lately(overrides)
    early_mb, mid_mb = measure_early(overrides), measure_mid()
    print(f"early fusion:  {early_mb:.3f} MB/sample")
    print(f"late fusion:   {late_mb:.4f} MB/sample")
    print(f"lately fusion: {lately_mb:.4f} MB/sample")
    print(f"mid (Disco):   {mid_mb:.2f} MB/sample")
    if args.json:
        import json

        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        with open(args.json, "w") as f:
            json.dump({"early_MB": round(early_mb, 4), "late_MB": round(late_mb, 5),
                       "lately_MB": round(lately_mb, 5), "mid_disco_MB": round(mid_mb, 3),
                       "protocol": "ref workspace/measure_exchange_size.py:15-96; "
                                   "mid = one agent's 384ch stride-4 bev_img"}, f, indent=1)
        print(f"wrote {args.json}")
