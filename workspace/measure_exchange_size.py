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
    sizes = []
    for i, batch in enumerate(loader):
        meta = batch["metadata"][0]
        n_modar = sum(v[1] for v in meta["exchange"].values())
        sizes.append(n_modar * 9 * 4)  # 9 float32 per MoDAR row
        if i + 1 >= max_samples:
            break
    return float(np.mean(sizes)) / 1e6 if sizes else 0.0


def measure_mid(compressed_channels=128, bev_hw=128, num_other_agents=5):
    # each non-ego agent broadcasts its compressed BEV tensor
    per_agent = bev_hw * bev_hw * compressed_channels * 4
    return num_other_agents * per_agent / 1e6


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()
    overrides = {"USE_SYNTHETIC_DATA": True} if args.synthetic else None
    print(f"early fusion:  {measure_early(overrides):.3f} MB/sample")
    print(f"lately fusion: {measure_lately(overrides):.4f} MB/sample")
    print(f"mid (Disco):   {measure_mid():.2f} MB/sample")
