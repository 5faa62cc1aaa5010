"""PillarNet 2D pillar backbones (PillarBackBone8x / PillarRes18BackBone8x).

Behavioral counterpart of
/root/reference/pcdet/models/backbones_3d/spconv_backbone_2d.py: four sparse
2D stages (stride 1/2/4/8) over the pillar grid plus a dense stride-16
stage, exporting multi_scale_2d_features x_conv4/x_conv5 for
BaseBEVBackboneV1.

TPU redesign: the pillar BEV grid is already dense on this pipeline, so each
"submanifold" layer is a dense NHWC conv masked back to the active-pillar set
(identical math — inactive inputs are zero, inactive outputs discarded), and
each strided sparse conv's active set is the 3x3/stride-2 dilation of the
previous one (spconv's output rule), computed as a max-pool over the mask.
The dense conv5 stage is a plain conv stack like the reference's.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _Conv2dBNReLU(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, active=None, train=False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="norm")(x)
        x = nn.relu(x)
        if active is not None:
            x = jnp.where(active[..., None], x, 0.0)
        return x


class _BasicBlock2D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, active=None, train=False):
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn2")(h)
        out = nn.relu(x + h)
        if active is not None:
            out = jnp.where(active[..., None], out, 0.0)
        return out


def _dilate_stride2(active):
    """Active set of a k3 s2 p1 sparse conv (any active input in footprint)."""
    a = active[..., None].astype(jnp.float32)
    pooled = nn.max_pool(a, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return pooled[..., 0] > 0


class PillarRes18BackBone8x(nn.Module):
    model_cfg: Any
    info: Any = None
    num_point_features: int = 32
    residual: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        nx, ny = int(self.info.grid_size[0]), int(self.info.grid_size[1])
        pf = out["pillar_features"]  # (B, ny*nx, C) dense pillar grid
        b, _, c = pf.shape
        x = pf.reshape(b, ny, nx, c)
        active = jnp.any(x != 0, axis=-1)

        def stage(x, active, ch, n_blocks, name, stride_in):
            if stride_in:
                x = _Conv2dBNReLU(ch, stride=2, name=f"{name}_down")(x, None, train)
                active = _dilate_stride2(active)
                x = jnp.where(active[..., None], x, 0.0)
            for i in range(n_blocks):
                if self.residual:
                    if x.shape[-1] != ch:
                        x = _Conv2dBNReLU(ch, name=f"{name}_proj")(x, active, train)
                    x = _BasicBlock2D(ch, name=f"{name}_res{i}")(x, active, train)
                else:
                    x = _Conv2dBNReLU(ch, name=f"{name}_conv{i}")(x, active, train)
            return x, active

        x1, a1 = stage(x, active, 32, 2, "conv1", stride_in=False)
        x2, a2 = stage(x1, a1, 64, 2, "conv2", stride_in=True)
        x3, a3 = stage(x2, a2, 128, 2, "conv3", stride_in=True)
        x4, a4 = stage(x3, a3, 256, 2, "conv4", stride_in=True)
        # dense stride-16 stage (reference conv5 over x_conv4.dense())
        x5 = _Conv2dBNReLU(256, stride=2, name="conv5_down")(x4, None, train)
        for i in range(2):
            if self.residual:
                x5 = _BasicBlock2D(256, name=f"conv5_res{i}")(x5, None, train)
            else:
                x5 = _Conv2dBNReLU(256, name=f"conv5_conv{i}")(x5, None, train)

        out["multi_scale_2d_features"] = {"x_conv4": x4, "x_conv5": x5}
        out["multi_scale_2d_strides"] = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4,
                                         "x_conv4": 8, "x_conv5": 16}
        out["spatial_features"] = x4
        out["spatial_features_stride"] = 8
        return out


class PillarBackBone8x(PillarRes18BackBone8x):
    """Non-residual flavor (reference spconv_backbone_2d.py:114-208)."""

    residual: bool = False
