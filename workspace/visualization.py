"""Point-cloud / detection visualization.

Capability match for /root/reference/workspace/o3d_visualization.py
(PointsPainter :29-175, BEVPainter :205-260, color_points_binary :198-203).
This environment is headless and ships no Open3D, so both painters render
with matplotlib — PointsPainter as a 3D scatter + wireframe boxes,
BEVPainter as the top-down projection — and `show(...)` writes a PNG when
given `save_to_path` (always available) instead of opening a window.
"""
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from pcp_tpu.utils.box_utils import boxes_to_corners_3d

# wireframe edges over the corner order of boxes_to_corners_3d
BOX_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
]


def get_boxes_vertices_coord(boxes) -> List[np.ndarray]:
    """(N, 7+) -> list of (8, 3) vertex arrays (reference :10-26)."""
    boxes = np.asarray(boxes)
    if boxes.size == 0:
        return []
    return list(boxes_to_corners_3d(boxes[:, :7]))


def color_points_binary(points_binary_channel) -> np.ndarray:
    """0/1 channel -> white/red colors (reference :198-203)."""
    c = np.asarray(points_binary_channel).astype(float).reshape(-1)
    colors = np.zeros((c.shape[0], 3))
    colors[:, 0] = c  # red where 1
    return colors


class PointsPainter:
    """3D scatter + wireframe-box painter, reference PointsPainter API."""

    def __init__(self, xyz, boxes=None):
        self.xyz = np.asarray(xyz)[:, :3]
        self.boxes = np.asarray(boxes) if boxes is not None else None
        self.num_boxes = 0 if self.boxes is None else self.boxes.shape[0]

    def show(self, xyz_color=None, boxes_color=None, boxes_velo=None,
             points_offset=None, special_points=None, view_point=None,
             save_to_path=None, point_size=0.3):
        fig = plt.figure(figsize=(12, 10))
        ax = fig.add_subplot(111, projection="3d")
        c = xyz_color if xyz_color is not None else "0.55"
        ax.scatter(self.xyz[:, 0], self.xyz[:, 1], self.xyz[:, 2],
                   s=point_size, c=c, linewidths=0)

        if self.boxes is not None and self.num_boxes:
            colors = (np.asarray(boxes_color) if boxes_color is not None
                      else np.tile([[1.0, 0, 0]], (self.num_boxes, 1)))
            for verts, col in zip(get_boxes_vertices_coord(self.boxes), colors):
                for a, b in BOX_EDGES:
                    ax.plot(*zip(verts[a], verts[b]), color=col, linewidth=0.9)
            if boxes_velo is not None:
                centers = self.boxes[:, :3]
                v = np.asarray(boxes_velo)
                ax.quiver(centers[:, 0], centers[:, 1], centers[:, 2],
                          v[:, 0], v[:, 1], np.zeros(len(v)), color="b")

        if points_offset is not None:
            off = np.asarray(points_offset)
            moved = np.linalg.norm(off, axis=1) > 1e-3
            seg = self.xyz[moved]
            for p, o in zip(seg, off[moved]):
                ax.plot([p[0], p[0] + o[0]], [p[1], p[1] + o[1]],
                        [p[2], p[2] + o[2]], color="g", linewidth=0.5)

        if special_points is not None:
            sp = np.asarray(special_points)
            ax.scatter(sp[:, 0], sp[:, 1], sp[:, 2], s=12, c="orange", marker="*")

        if view_point is not None:
            ax.view_init(elev=view_point.get("elev", 35),
                         azim=view_point.get("azim", -60))
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        if save_to_path is not None:
            fig.savefig(save_to_path, dpi=130, bbox_inches="tight")
            plt.close(fig)
            return save_to_path
        return fig


class BEVPainter:
    """Top-down painter (reference BEVPainter :205-260)."""

    def __init__(self, pc_range):
        self.pc_range = np.asarray(pc_range, dtype=float)

    def draw_1box(self, axe, box, box_color, linestyle="solid", linewidth=1):
        verts = get_boxes_vertices_coord(box[None, :7])[0][:4, :2]  # bottom face
        loop = np.concatenate([verts, verts[:1]], axis=0)
        axe.plot(loop[:, 0], loop[:, 1], color=box_color,
                 linestyle=linestyle, linewidth=linewidth)
        # heading tick: center -> mid of the front edge
        center = box[:2]
        front = (verts[0] + verts[3]) / 2
        axe.plot([center[0], front[0]], [center[1], front[1]],
                 color=box_color, linewidth=linewidth)

    def show_bev(self, xyz, axe=None, xyz_color=None, special_points=None,
                 gt_boxes=None, pred_boxes=None, save_to_path=None, point_size=0.3):
        own = axe is None
        if own:
            fig, axe = plt.subplots(figsize=(10, 10))
        xyz = np.asarray(xyz)
        axe.scatter(xyz[:, 0], xyz[:, 1], s=point_size,
                    c=xyz_color if xyz_color is not None else "0.6", linewidths=0)
        if gt_boxes is not None:
            for b in np.asarray(gt_boxes):
                self.draw_1box(axe, b, "g")
        if pred_boxes is not None:
            for b in np.asarray(pred_boxes):
                self.draw_1box(axe, b, "r", linestyle="dashed")
        if special_points is not None:
            sp = np.asarray(special_points)
            axe.scatter(sp[:, 0], sp[:, 1], s=10, c="orange", marker="*")
        axe.set_xlim(self.pc_range[0], self.pc_range[3])
        axe.set_ylim(self.pc_range[1], self.pc_range[4])
        axe.set_aspect("equal")
        if save_to_path is not None and own:
            axe.figure.savefig(save_to_path, dpi=130, bbox_inches="tight")
            plt.close(axe.figure)
        return axe


def print_dict(d: dict, name=""):
    """Reference :178-195 — recursive shape/type dump."""
    print(f"{name}: {{")
    for k, v in d.items():
        if isinstance(v, dict):
            print_dict(v, name=f"{name}/{k}")
        elif hasattr(v, "shape"):
            print(f"  {k}: {type(v).__name__} {tuple(v.shape)}")
        else:
            print(f"  {k}: {v}")
    print("}")
