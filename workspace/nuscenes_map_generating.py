"""Pre-rasterize HD-map BEV layers for every nuScenes sample.

Counterpart of /root/reference/workspace/nuscenes_map_generating.py: loads
the 10-sweep info pkls, runs MapMaker.make_representation per sample and
saves `hd_map/map_<token>.npy` rasters that NuScenesDataset's USE_HD_MAP
path interpolates per point. Requires the nuScenes dataset + devkit on disk
(loud-fails here otherwise; the geometric rasterizer core is devkit-free and
unit-tested in tests/test_nuscenes_stack.py).

    python workspace/nuscenes_map_generating.py --ver v1.0-trainval
"""
import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pcp_tpu.config import ROOT_DIR
from pcp_tpu.datasets.nuscenes.map_utils import MapMaker


def include_nuscenes_data(data_root):
    infos = []
    for name in ("nuscenes_infos_10sweeps_train.pkl", "nuscenes_infos_10sweeps_val.pkl"):
        p = Path(data_root) / name
        if not p.exists():
            continue
        with open(p, "rb") as f:
            infos.extend(pickle.load(f))
    print(f"Total samples for NuScenes dataset: {len(infos)}")
    return infos


def main(nusc_ver):
    try:
        from nuscenes import NuScenes
    except ImportError as e:
        raise SystemExit(
            "nuscenes-devkit is not installed — map generation needs the real "
            "dataset + devkit; the rasterizer core is available as "
            "pcp_tpu.datasets.nuscenes.map_utils.make_map_representation") from e

    point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    data_root = ROOT_DIR / "data" / "nuscenes" / nusc_ver
    map_dir = data_root / "hd_map"
    map_dir.mkdir(parents=True, exist_ok=True)

    nusc = NuScenes(dataroot=str(data_root), version=nusc_ver, verbose=False)
    infos = include_nuscenes_data(data_root)
    map_maker = MapMaker(nusc, resolution=0.2, point_cloud_range=point_cloud_range,
                         normalize_lane_angle=False)
    for i, info in enumerate(infos):
        sample_rec = nusc.get("sample", info["token"])
        map_file = map_dir / f"map_{info['token']}.npy"
        if map_file.is_file():
            continue
        img_map = map_maker.make_representation(sample_rec["data"]["LIDAR_TOP"])
        np.save(map_file, img_map)
        if i % 200 == 0:
            print(f"{i}/{len(infos)}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ver", type=str, default="v1.0-trainval")
    main(parser.parse_args().ver)
