"""Exchange database: the V2X communication channel.

In the reference, agents "broadcast" by writing per-sample ``.pth`` tensors
(MoDAR boxes from the detection head, center_head.py:409-427; foreground
points + scene flow from HunterJr, hunter_jr.py:377-397) that the ego dataset
later reads (v2x_sim_dataset_ego.py:192-232). Same design here with
``.npz`` files (no torch dependency on the read path):

    {sample_token}_id{lidar_id}_modar.npz       -> (N, 9)  box7, score, label
    {sample_token}_id{lidar_id}_foreground.npz  -> (N, 13) point5, sweep, inst,
                                                    cls_prob3, flow3
    {sample_token}_id{lidar_id}_boxflow.npz     -> (N, 12) box7, score, label,
                                                    per-box pooled flow3

``boxflow`` is the bandwidth-optimal broadcast: the ego only ever uses the
exchanged foreground points to pool a mean scene flow per MoDAR box
(ref v2x_sim_dataset_ego.py:196-232), so the sender can pool its own
foreground into 3 extra floats per box — mathematically identical async
propagation at late-fusion bandwidth (12 vs 9 floats/row) instead of
shipping every foreground point.
"""
from pathlib import Path

import numpy as np


def pool_box_flow(modar, foreground):
    """Sender-side flow pooling: (N, 9) modar + (M, 13) foreground ->
    (N, 12) boxflow rows ``[box7, score, label, mean_flow3]``.

    Identical math to the ego's receiver-side pooling
    (v2x_sim_dataset_ego._load_and_propagate_modar): mean of the member
    foreground points' flow per box; boxes with no member points get zero
    flow (no propagation offset).
    """
    from ..datasets.v2x_sim.source import _points_in_boxes_np

    modar = np.asarray(modar)
    out = np.zeros((modar.shape[0], 12), dtype=np.float64)
    out[:, :9] = modar[:, :9]
    if foreground is not None and foreground.shape[0] > 0 and modar.shape[0] > 0:
        box_idx = _points_in_boxes_np(foreground[:, :3], modar[:, :7])
        valid = box_idx > -1
        if valid.any():
            fg, bi = foreground[valid], box_idx[valid]
            for b in np.unique(bi):
                out[b, 9:12] = fg[bi == b, -3:].mean(axis=0)
    return out


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

    def save_boxflow(self, sample_token, lidar_id, boxflow):
        self.ensure_dir()
        np.savez_compressed(
            self._path(sample_token, lidar_id, "boxflow"), data=np.asarray(boxflow)
        )

    def load_boxflow(self, sample_token, lidar_id):
        p = self._path(sample_token, lidar_id, "boxflow")
        if not p.exists():
            return None
        return np.load(p)["data"]

    def size_bytes(self, sample_token, lidar_id, kind):
        p = self._path(sample_token, lidar_id, kind)
        return p.stat().st_size if p.exists() else 0
