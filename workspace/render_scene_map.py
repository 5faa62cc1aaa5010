"""Render a scene's HD-map rasters (binary layers + direction-colored lanes).

Counterpart of /root/reference/workspace/visualization/render_scene_map.py
and rasterize_lane_dir.py: walks a scene, rasterizes the 4 binary map layers
and the lane-direction channel around each sample's lidar pose, and saves
color renders. Requires nuScenes + devkit on disk (the rasterizer core is
devkit-free: pcp_tpu.datasets.nuscenes.map_utils).

    python workspace/render_scene_map.py [--ver v1.0-mini] [--out_dir map_renders]
"""
import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pcp_tpu.config import ROOT_DIR
from pcp_tpu.datasets.nuscenes.map_utils import MapMaker


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ver", type=str, default="v1.0-mini")
    parser.add_argument("--out_dir", type=str, default="map_renders")
    args = parser.parse_args()
    try:
        from nuscenes import NuScenes
    except ImportError as e:
        raise SystemExit("render_scene_map needs nuscenes-devkit + map data") from e

    nusc = NuScenes(dataroot=str(ROOT_DIR / "data" / "nuscenes" / args.ver),
                    version=args.ver, verbose=False)
    maker = MapMaker(nusc, resolution=0.2)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    scene = nusc.scene[0]
    sample_tk = scene["first_sample_token"]
    i = 0
    while sample_tk != "":
        sample = nusc.get("sample", sample_tk)
        raster = maker.make_representation(sample["data"]["LIDAR_TOP"])  # (5, H, W)
        fig, axes = plt.subplots(1, 2, figsize=(14, 7))
        axes[0].imshow(raster[0], origin="lower", cmap="gray")
        axes[0].set_title("drivable area")
        # lane-direction channel rendered as hue (reference lane_hsv coloring)
        lane = raster[-1]
        hsv = np.zeros(lane.shape + (3,))
        hsv[..., 0] = lane
        hsv[..., 1] = 1.0
        hsv[..., 2] = (lane > 0).astype(float)
        axes[1].imshow(matplotlib.colors.hsv_to_rgb(hsv), origin="lower")
        axes[1].set_title("lane direction (hue)")
        fig.savefig(out_dir / f"map_{i:03d}.png", dpi=110, bbox_inches="tight")
        plt.close(fig)
        sample_tk = sample["next"]
        i += 1
    print(f"{i} renders -> {out_dir}")


if __name__ == "__main__":
    main()
