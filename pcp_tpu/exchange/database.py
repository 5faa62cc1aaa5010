"""Exchange database: the V2X communication channel.

In the reference, agents "broadcast" by writing per-sample ``.pth`` tensors
(MoDAR boxes from the detection head, center_head.py:409-427; foreground
points + scene flow from HunterJr, hunter_jr.py:377-397) that the ego dataset
later reads (v2x_sim_dataset_ego.py:192-232). Same design here with
``.npz`` files (no torch dependency on the read path):

    {sample_token}_id{lidar_id}_modar.npz       -> (N, 9)  box7, score, label
    {sample_token}_id{lidar_id}_foreground.npz  -> (N, 13) point5, sweep, inst,
                                                    cls_prob3, flow3
"""
from pathlib import Path

import numpy as np


class ExchangeDatabase:
    def __init__(self, directory):
        self.directory = Path(directory)

    def ensure_dir(self):
        self.directory.mkdir(parents=True, exist_ok=True)

    def _path(self, sample_token, lidar_id, kind):
        return self.directory / f"{sample_token}_id{lidar_id}_{kind}.npz"

    def save_modar(self, sample_token, lidar_id, modar):
        self.ensure_dir()
        np.savez_compressed(self._path(sample_token, lidar_id, "modar"), data=np.asarray(modar))

    def load_modar(self, sample_token, lidar_id):
        p = self._path(sample_token, lidar_id, "modar")
        if not p.exists():
            return None
        return np.load(p)["data"]

    def save_foreground(self, sample_token, lidar_id, foreground):
        self.ensure_dir()
        np.savez_compressed(
            self._path(sample_token, lidar_id, "foreground"), data=np.asarray(foreground)
        )

    def load_foreground(self, sample_token, lidar_id):
        p = self._path(sample_token, lidar_id, "foreground")
        if not p.exists():
            return None
        return np.load(p)["data"]

    def size_bytes(self, sample_token, lidar_id, kind):
        p = self._path(sample_token, lidar_id, kind)
        return p.stat().st_size if p.exists() else 0
