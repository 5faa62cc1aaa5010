"""Evaluation CLI.

Counterpart of /root/reference/tools/test.py: single-checkpoint evaluation of a
config on the val split, writing metrics to the output tree.
"""
import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from pcp_tpu.config import cfg, cfg_from_yaml_file, cfg_from_list
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.train.checkpoint import load_params_from_file, latest_checkpoint
from pcp_tpu.train.eval_utils import eval_one_epoch
from pcp_tpu.train.train_utils import _to_device_batch
from pcp_tpu.utils.common_utils import create_logger


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--infer_time", action="store_true", default=False)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg_ = parse_config()
    batch_size = args.batch_size or cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU

    output_dir = cfg_.ROOT_DIR / "output" / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    eval_dir = output_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    log_file = eval_dir / ("log_eval_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
    logger = create_logger(log_file)
    logger.info(f"devices: {jax.devices()}")

    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG,
        class_names=cfg_.CLASS_NAMES,
        batch_size=batch_size,
        root_path=None,
        workers=args.workers,
        logger=logger,
        training=False,
    )

    info = DatasetInfo.from_data_cfg(cfg_.DATA_CONFIG, cfg_.CLASS_NAMES)
    model = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES), dataset_info=info)

    variables = None
    if not getattr(model, "is_host_model", False):
        ckpt = args.ckpt or (latest_checkpoint(args.ckpt_dir) if args.ckpt_dir else None)
        if ckpt is not None:
            variables = load_params_from_file(ckpt)
            logger.info(f"loaded checkpoint {ckpt}")
        else:
            logger.warning("no checkpoint given -> random init (smoke mode)")
            example = next(iter(test_loader))
            variables = model.init(jax.random.PRNGKey(0), _to_device_batch(example), train=False)

    result_str, result_dict, _ = eval_one_epoch(
        model, variables, test_set, test_loader, cfg_.CLASS_NAMES, logger=logger,
        recall_thresh_list=cfg_.MODEL.POST_PROCESSING.RECALL_THRESH_LIST,
        output_path=eval_dir,
    )
    logger.info("\n" + result_str)
    logger.info(f"result_dict: {result_dict}")


if __name__ == "__main__":
    main()
