"""Quick demo: run a trained detector over raw point-cloud files and render
the detections.

Counterpart of /root/reference/tools/demo.py (DemoDataset over *.bin / *.npy
files :23-60, per-sample forward + draw :62-112), rendering through the
headless matplotlib painters in workspace/visualization.py instead of
Open3D/mayavi windows — each sample saves `demo_<i>.png` next to --out_dir.

    python tools/demo.py --cfg_file tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_car.yaml \
        --ckpt <ckpt> --data_path <dir-or-file> [--ext .bin] [--out_dir demo_out]

With no --data_path, one synthetic-world sample is generated (this
environment has no raw dataset on disk).
"""
import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pcp_tpu.config import cfg, cfg_from_yaml_file
from pcp_tpu.datasets import DatasetTemplate, build_dataloader
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo
from pcp_tpu.train.checkpoint import load_params_from_file
from pcp_tpu.train.train_utils import _to_device_batch
from pcp_tpu.utils.common_utils import create_logger


class DemoDataset(DatasetTemplate):
    """Folder of raw clouds -> model-ready samples (reference demo.py:23-60)."""

    def __init__(self, dataset_cfg, class_names, root_path, ext=".bin", logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=False, root_path=root_path, logger=logger)
        self.ext = ext
        root = Path(root_path)
        files = glob.glob(str(root / f"*{ext}")) if root.is_dir() else [str(root)]
        self.sample_file_list = sorted(files)

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        f = self.sample_file_list[index]
        if self.ext == ".bin":
            points = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        elif self.ext == ".npy":
            points = np.load(f)
        else:
            raise NotImplementedError(self.ext)
        return self.prepare_data(data_dict={"points": points, "frame_id": index})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, default=None,
                        help="point cloud file or directory (*.bin / *.npy)")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ext", type=str, default=".bin")
    parser.add_argument("--out_dir", type=str, default="demo_out")
    parser.add_argument("--score_thresh", type=float, default=0.3)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        from pcp_tpu.config import cfg_from_list

        cfg_from_list(args.set_cfgs, cfg)
    logger = create_logger()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.data_path is not None:
        dataset = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                              root_path=args.data_path, ext=args.ext, logger=logger)
        batches = (dataset.collate_batch([dataset[i]]) for i in range(len(dataset)))
    else:
        logger.info("no --data_path -> one synthetic-world sample")
        cfg.DATA_CONFIG["USE_SYNTHETIC_DATA"] = True
        dataset, loader, _ = build_dataloader(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
            batch_size=1, workers=0, logger=logger, training=False)
        batches = iter(loader)

    info = DatasetInfo.from_data_cfg(cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset_info=info)

    variables = None

    @jax.jit
    def fwd(variables, batch):
        out = model.apply(variables, batch, train=False)
        return out["final_box_dicts"]

    from workspace.visualization import BEVPainter, PointsPainter

    for i, batch in enumerate(batches):
        dev = _to_device_batch(batch)
        if variables is None:
            if args.ckpt:
                variables = load_params_from_file(args.ckpt)
                logger.info(f"loaded {args.ckpt}")
            else:
                logger.warning("no --ckpt -> random weights (smoke rendering)")
                variables = model.init(jax.random.PRNGKey(0), dev, train=False)
        fbd = {k: np.asarray(v) for k, v in fwd(variables, dev).items()}
        keep = fbd["pred_valid"][0] & (fbd["pred_scores"][0] >= args.score_thresh)
        boxes = fbd["pred_boxes"][0][keep][:, :7]
        pts = np.asarray(batch["points"][0])[np.asarray(batch["points_mask"][0])]
        logger.info(f"sample {i}: {keep.sum()} detections >= {args.score_thresh}")

        gt = None
        if "gt_boxes" in batch:
            g = np.asarray(batch["gt_boxes"][0])
            gt = g[np.any(g != 0, axis=-1)][:, :7]
        PointsPainter(pts[:, :3], boxes).show(
            save_to_path=str(out_dir / f"demo_{i}.png"))
        BEVPainter(cfg.DATA_CONFIG["POINT_CLOUD_RANGE"]).show_bev(
            pts[:, :3], pred_boxes=boxes, gt_boxes=gt,
            save_to_path=str(out_dir / f"demo_{i}_bev.png"))
        if i >= 9:
            break
    logger.info(f"renders -> {out_dir}")


if __name__ == "__main__":
    main()
