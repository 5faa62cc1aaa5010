"""Dump deterministic collated batches as fixtures (counterpart of the
reference tools/create_sample_batch_dict.py): useful for golden-file tests and
offline debugging of the device pipeline."""
import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.utils.common_utils import create_logger, set_random_seed

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--out", default="sample_batch_dict.pkl")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--training", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    set_random_seed(666)
    cfg = CfgDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.synthetic:
        cfg.DATA_CONFIG["USE_SYNTHETIC_DATA"] = True
    _, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size,
                                    training=args.training, logger=create_logger(), workers=0, seed=666)
    batch = next(iter(loader))
    with open(args.out, "wb") as f:
        pickle.dump(batch, f)
    print(f"wrote {args.out}: keys={sorted(batch.keys())}")
