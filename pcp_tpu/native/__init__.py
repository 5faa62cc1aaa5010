"""Native host runtime: C++ point-cloud assembly kernels via ctypes.

Replaces the reference's CUDA-in-the-dataloader host work with optimized CPU
code (the TPU input pipeline is host-bound). Built lazily with g++ on first
import; every entry point has a numpy fallback so the framework runs without
a toolchain.
"""
import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "pointcloud.cpp"
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        tag = hashlib.md5(_SRC.read_bytes()).hexdigest()[:10]
        build_dir = _HERE / "build"
        build_dir.mkdir(exist_ok=True)
        so_path = build_dir / f"libpcppc_{tag}.so"
        if not so_path.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so_path)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so_path))
        lib.transform_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sweep_expand.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        lib.range_mask_pad.restype = ctypes.c_int64
        lib.range_mask_pad.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.points_in_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def available():
    return _build_and_load() is not None


def transform_points_(pts, se3):
    """In-place SE(3) transform of the first 3 columns of (N, C>=3) float32."""
    lib = _build_and_load()
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    if lib is None:
        rot, t = np.asarray(se3)[:3, :3], np.asarray(se3)[:3, 3]
        pts[:, :3] = pts[:, :3] @ rot.T + t
        return pts
    se3 = np.ascontiguousarray(se3, dtype=np.float64)
    lib.transform_points(_fptr(pts), pts.shape[0], pts.shape[1], _dptr(se3))
    return pts


def sweep_expand(pts_box, poses, timelags, inst_idx):
    """Expand one instance's box-frame points through historical poses.

    Args:
        pts_box: (n, 4) float32 box-frame points.
        poses: (s, 4, 4) float64 lidar_se3_box per sweep.
        timelags: (s,) float64.
    Returns (s * n, 7) float32: point5, sweep_idx, inst_idx.
    """
    lib = _build_and_load()
    pts_box = np.ascontiguousarray(pts_box, dtype=np.float32)
    poses = np.ascontiguousarray(poses, dtype=np.float64)
    timelags = np.ascontiguousarray(timelags, dtype=np.float64)
    s, n = poses.shape[0], pts_box.shape[0]
    if lib is None:
        batch = np.tile(pts_box[None], (s, 1, 1))
        xyz = np.einsum("sij,snj->sni", poses[:, :3, :3], batch[:, :, :3]) + poses[:, None, :3, 3]
        out = np.concatenate(
            [
                xyz, batch[:, :, 3:4],
                np.tile(timelags[:, None, None], (1, n, 1)),
                np.tile(np.arange(s, dtype=np.float64)[:, None, None], (1, n, 1)),
                np.full((s, n, 1), inst_idx),
            ],
            axis=-1,
        )
        return out.reshape(s * n, 7).astype(np.float32)
    out = np.empty((s * n, 7), dtype=np.float32)
    lib.sweep_expand(_fptr(pts_box), n, _dptr(poses), _dptr(timelags), s, float(inst_idx), _fptr(out))
    return out


def points_in_boxes_np(points, boxes):
    """First containing-box index per point, -1 if none (native when built)."""
    lib = _build_and_load()
    points = np.ascontiguousarray(points, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    if lib is None or boxes.shape[0] == 0:
        out = -np.ones(points.shape[0], dtype=np.int64)
        for j, b in enumerate(boxes):
            rel = points[:, :3] - b[:3]
            c, s = np.cos(b[6]), np.sin(b[6])
            lx = c * rel[:, 0] + s * rel[:, 1]
            ly = -s * rel[:, 0] + c * rel[:, 1]
            inside = (
                (np.abs(rel[:, 2]) <= b[5] / 2)
                & (np.abs(lx) < b[3] / 2 + 1e-5)
                & (np.abs(ly) < b[4] / 2 + 1e-5)
            )
            out[(out < 0) & inside] = j
        return out
    out = np.empty(points.shape[0], dtype=np.int64)
    lib.points_in_boxes(
        _fptr(points), points.shape[0], points.shape[1], _fptr(boxes), boxes.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
