"""Training CLI.

Counterpart of /root/reference/tools/train.py: argparse surface (cfg_file,
batch_size, epochs, extra_tag, ckpt, workers, --set overrides), output tree
``output/{EXP_GROUP}/{TAG}/{extra_tag}/ckpt``, auto-resume from the newest
checkpoint, then training via the jitted data-parallel step. Multi-chip data
parallelism comes from the jax mesh (no launcher processes needed on TPU).
"""
import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pcp_tpu.config import cfg, cfg_from_yaml_file, cfg_from_list, log_config_to_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.train import build_optimizer, create_train_state
from pcp_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from pcp_tpu.train.train_utils import train_model, _to_device_batch
from pcp_tpu.utils.common_utils import create_logger, set_random_seed


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=None,
                        help="explicit training seed (init PRNG + numpy/python RNG); "
                             "distinct values give independent repeat runs for "
                             "variance estimation. Overrides --fix_random_seed.")
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--ckpt_save_time_interval", type=int, default=300,
                        help="seconds between overwriting 'latest_model' snapshots")
    parser.add_argument("--precise_bn", type=int, default=30,
                        help="bake dataset-average BN stats (SWA update_bn) into the "
                             "final checkpoint, averaging over N train batches (0 = off)")
    parser.add_argument("--precise_bn_every", type=int, default=0,
                        help="additionally bake every Nth epoch checkpoint (for "
                             "--eval_all workflows; 0 = final epoch only)")
    parser.add_argument("--num_epochs_to_eval", type=int, default=15,
                        help="auto-eval the last N epoch checkpoints after training (0 = off)")
    parser.add_argument("--max_waiting_mins", type=int, default=0)
    parser.add_argument("--infer_time", action="store_true", default=False)
    parser.add_argument("--profile", action="store_true", help="capture a jax.profiler trace of early steps")
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
    batch_size = args.batch_size or cfg_.OPTIMIZATION.BATCH_SIZE_PER_GPU * max(
        len(jax.devices()), 1
    )
    epochs = args.epochs or cfg_.OPTIMIZATION.NUM_EPOCHS

    output_dir = cfg_.ROOT_DIR / "output" / cfg_.EXP_GROUP_PATH / cfg_.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ("log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
    logger = create_logger(log_file)

    logger.info("**********************Start logging**********************")
    logger.info(f"devices: {jax.devices()}")
    log_config_to_file(cfg_, logger=logger)
    if args.seed is not None:
        seed = args.seed
        set_random_seed(seed)
        logger.info(f"training seed: {seed}")
    else:
        seed = 666 if args.fix_random_seed else 0
        if args.fix_random_seed:
            set_random_seed(666)

    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=cfg_.DATA_CONFIG,
        class_names=cfg_.CLASS_NAMES,
        batch_size=batch_size,
        root_path=None,
        workers=args.workers,
        logger=logger,
        training=True,
    )

    info = DatasetInfo.from_data_cfg(cfg_.DATA_CONFIG, cfg_.CLASS_NAMES)
    model = build_network(cfg_.MODEL, num_class=len(cfg_.CLASS_NAMES), dataset_info=info)

    tx, lr_fn = build_optimizer(cfg_.OPTIMIZATION, len(train_loader), epochs)

    example = next(iter(train_loader))
    state = create_train_state(model, tx, jax.random.PRNGKey(seed), _to_device_batch(example))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f"model parameters: {n_params}")

    # frozen BEVMaker sub-nets load their own single-agent checkpoints at
    # build time (reference bev_maker.py:30-34); CKPT paths resolve like the
    # reference's (relative to tools/, i.e. the repo root after stripping ../)
    for maker_key in ("BEV_MAKER_RSU", "BEV_MAKER_CAR", "BEV_MAKER_EARLY"):
        mk_cfg = cfg_.MODEL.get(maker_key)
        if mk_cfg is None or not mk_cfg.get("CKPT"):
            continue
        from pcp_tpu.train.checkpoint import overlay_bev_maker_weights

        ckpt_path = Path(str(mk_cfg["CKPT"]))
        if not ckpt_path.exists():
            stripped = str(mk_cfg["CKPT"])
            while stripped.startswith("../") or stripped.startswith("./"):
                stripped = stripped.split("/", 1)[1]
            ckpt_path = cfg_.ROOT_DIR / stripped
        if not ckpt_path.exists():
            logger.warning(f"{maker_key}.CKPT not found: {mk_cfg['CKPT']} — maker stays random")
            continue
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = overlay_bev_maker_weights(
            variables, maker_key.lower(), ckpt_path, logger=logger)
        state = state.replace(params=variables["params"], batch_stats=variables["batch_stats"])

    start_epoch = 0
    resume_from = args.ckpt or latest_checkpoint(ckpt_dir)
    if resume_from is not None:
        state, start_epoch, _ = load_checkpoint(resume_from, state)
        logger.info(f"resumed from {resume_from} (epoch {start_epoch})")

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(log_dir=str(output_dir / "tensorboard"))
    except Exception:
        logger.info("tensorboard writer unavailable; scalars go to the log only")

    logger.info("**********************Start training**********************")
    train_model(
        model, state, tx, train_loader, epochs, ckpt_dir, logger=logger,
        max_ckpt_save_num=args.max_ckpt_save_num, start_epoch=start_epoch,
        profile_dir=(output_dir / "profile") if args.profile else None,
        tb_writer=tb_writer, ckpt_save_time_interval=args.ckpt_save_time_interval,
        precise_bn_batches=args.precise_bn, precise_bn_every=args.precise_bn_every,
    )
    logger.info("**********************Training done**********************")

    if args.num_epochs_to_eval > 0:
        # post-train auto-eval of the last N checkpoints (ref train.py:205-221)
        from tools.test import repeat_eval_ckpt

        logger.info("**********************Start evaluation**********************")
        test_set, test_loader, _ = build_dataloader(
            dataset_cfg=cfg_.DATA_CONFIG,
            class_names=cfg_.CLASS_NAMES,
            batch_size=batch_size,
            root_path=None,
            workers=args.workers,
            logger=logger,
            training=False,
        )
        args.start_epoch = max(epochs - args.num_epochs_to_eval, 0)
        args.ckpt = None
        args.ckpt_dir = str(ckpt_dir)
        repeat_eval_ckpt(
            model, test_set, test_loader, args, cfg_,
            output_dir / "eval" / "eval_with_train", logger, ckpt_dir,
            tb_writer=tb_writer,
        )
        logger.info("**********************End evaluation**********************")


if __name__ == "__main__":
    main()
