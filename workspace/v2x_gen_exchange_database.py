"""Exchange-database generator — the "broadcast" step of lately fusion.

Counterpart of /root/reference/workspace/v2x_gen_exchange_database.py: runs the
trained car/rsu model over train+val with augmentation off and writes each
sample's MoDAR boxes + foreground-with-flow points into the exchange database
(the filesystem IS the V2X channel).

Usage:
    python workspace/v2x_gen_exchange_database.py --agent car \
        [--ckpt .../checkpoint_epoch_20] [--synthetic]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.exchange import ExchangeDatabase
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.train.checkpoint import load_params_from_file
from pcp_tpu.train.eval_utils import eval_one_epoch, make_exchange_writer
from pcp_tpu.train.train_utils import _to_device_batch
from pcp_tpu.utils.common_utils import create_logger

_REPO = Path(__file__).resolve().parent.parent
AGENT_CFGS = {
    "car": str(_REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_car.yaml"),
    "rsu": str(_REPO / "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_rsu.yaml"),
}


def gen_exchange_database(agent="car", ckpt=None, synthetic=False, out_dir=None,
                          splits=("train", "test"), cfg_overrides=None, logger=None,
                          variables=None, max_batches=None,
                          broadcast_score_thresh=None, broadcast_post_max=None):
    """``broadcast_score_thresh`` / ``broadcast_post_max`` loosen the SENDER's
    post-processing for the broadcast only (more, lower-confidence MoDAR
    boxes): the ego sees the score channel and can learn to discount them —
    the sender-recall lever for closing the lately-vs-early gap."""
    logger = logger or create_logger()
    cfg = CfgDict()
    cfg_from_yaml_file(AGENT_CFGS[agent], cfg)
    if broadcast_score_thresh is not None:
        cfg.MODEL.DENSE_HEAD.POST_PROCESSING["SCORE_THRESH"] = float(broadcast_score_thresh)
    if broadcast_post_max is not None:
        cfg.MODEL.DENSE_HEAD.POST_PROCESSING.NMS_CONFIG["NMS_POST_MAXSIZE"] = int(broadcast_post_max)
    # generation runs with augmentation + downsampling off (reference :30-34)
    cfg.DATA_CONFIG.DATA_AUGMENTOR.DISABLE_AUG_LIST = [
        c["NAME"] for c in cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST
    ]
    cfg.DATA_CONFIG["DATASET_DOWNSAMPLING_RATIO"] = 1
    if synthetic:
        cfg.DATA_CONFIG["USE_SYNTHETIC_DATA"] = True
    if cfg_overrides:
        cfg.DATA_CONFIG.update(cfg_overrides)

    info = DatasetInfo.from_data_cfg(cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset_info=info)

    first = True
    for split in splits:
        training = split == "train"
        # build with training=<split> so include_v2x_sim_data loads THAT
        # split's infos (DATA_SPLIT[mode]); then flip ds.training off so
        # prepare_data behaves eval-like (no aug / no empty-gt resampling).
        # Building both splits with training=False silently generated the
        # val split twice and left the TRAIN split without exchange data —
        # the ego then trained without MoDAR (missing files load as None).
        ds, loader, _ = build_dataloader(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES, batch_size=2,
            workers=2, logger=logger, training=training,
        )
        ds.training = False
        if training:
            # the train-split loader shuffles and drops the last ragged batch;
            # generation must cover every sample exactly once
            from pcp_tpu.datasets import DataLoader as _DL

            loader = _DL(ds, batch_size=2, shuffle=False, seed=None,
                         drop_last=False, num_workers=2)
        if first:
            if variables is None:
                if ckpt is not None:
                    variables = load_params_from_file(ckpt)
                else:
                    logger.warning("no checkpoint -> random weights (smoke mode)")
                    example = next(iter(loader))
                    variables = model.init(
                        jax.random.PRNGKey(0), _to_device_batch(example), train=False
                    )
            first = False

        exch_dir = out_dir or (
            ds.root_path / cfg.DATA_CONFIG.get("EXCHANGE_DATABASE_DIRECTORY", "exchange_database_flow")
        )
        db = ExchangeDatabase(exch_dir)
        writer = make_exchange_writer(db)

        n = 0
        fwd = None
        import numpy as np

        @jax.jit
        def fwd_fn(variables, dev_batch):
            out = model.apply(variables, dev_batch, train=False)
            keep = {"final_box_dicts": out["final_box_dicts"]}
            for k in ("points_cls_prob", "points_flow3d"):
                if k in out:
                    keep[k] = out[k]
            return keep

        for batch in loader:
            out = fwd_fn(variables, _to_device_batch(batch))
            out = jax.tree_util.tree_map(np.asarray, out)
            writer(batch, out)
            n += 1
            if max_batches is not None and n >= max_batches:
                break
        logger.info(f"exchange data written for split={split} -> {exch_dir}")
    return variables


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--agent", choices=["car", "rsu"], default="car")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--broadcast_score_thresh", type=float, default=None)
    parser.add_argument("--broadcast_post_max", type=int, default=None)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
                        help="DATA_CONFIG overrides as KEY VALUE pairs (e.g. "
                             "--set SYNTHETIC \"{'NUM_SCENES': 15}\")")
    args = parser.parse_args()
    overrides = None
    if args.set_cfgs:
        import ast

        assert len(args.set_cfgs) % 2 == 0, "--set expects KEY VALUE pairs"
        overrides = {}
        for k, v in zip(args.set_cfgs[0::2], args.set_cfgs[1::2]):
            try:
                overrides[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                overrides[k] = v
    gen_exchange_database(args.agent, args.ckpt, args.synthetic, args.out_dir,
                          cfg_overrides=overrides,
                          broadcast_score_thresh=args.broadcast_score_thresh,
                          broadcast_post_max=args.broadcast_post_max)
