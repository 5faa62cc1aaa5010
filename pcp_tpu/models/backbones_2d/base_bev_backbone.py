"""Multi-scale dense BEV backbone (NHWC, TPU conv layout).

Capability match for /root/reference/pcdet/models/backbones_2d/base_bev_backbone.py:6-112:
per-level [Conv s / Conv 1]*n blocks with BN(eps 1e-3, mom 0.01)+ReLU, and
transposed-conv (stride >= 1) or strided-conv (stride < 1) "deblocks" whose
outputs are channel-concatenated into ``spatial_features_2d``.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None  # compute dtype (params stay f32); None = f32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)) if self.kernel == 3 else "VALID", use_bias=False,
            name="conv", dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DeConvBNReLU(nn.Module):
    features: int
    stride: int  # upsample factor
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.ConvTranspose(
            self.features, (self.stride, self.stride), strides=(self.stride, self.stride),
            padding="VALID", use_bias=False, name="deconv", dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DownConvBNReLU(nn.Module):
    features: int
    stride: int  # downsample factor (kernel == stride)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.stride, self.stride), strides=(self.stride, self.stride),
            padding="VALID", use_bias=False, name="conv", dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int
    bf16: bool = False

    def setup(self):
        cfg = self.model_cfg
        # BF16: True runs the conv stack in bfloat16 (params/BN stats stay
        # f32; output cast back to f32) — MXU-native inference mode
        self.dtype = jnp.bfloat16 if (self.bf16 or bool(cfg.get("BF16", False))) else None
        layer_nums = list(cfg.get("LAYER_NUMS", []))
        layer_strides = list(cfg.get("LAYER_STRIDES", []))
        num_filters = list(cfg.get("NUM_FILTERS", []))
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
        num_upsample_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []))

        blocks = []
        deblocks = []
        for idx in range(len(layer_nums)):
            level = [ConvBNReLU(num_filters[idx], stride=layer_strides[idx], dtype=self.dtype, name=f"block{idx}_0")]
            for k in range(layer_nums[idx]):
                level.append(ConvBNReLU(num_filters[idx], dtype=self.dtype, name=f"block{idx}_{k + 1}"))
            blocks.append(level)
            if upsample_strides:
                s = upsample_strides[idx]
                if s >= 1:
                    deblocks.append(
                        DeConvBNReLU(num_upsample_filters[idx], int(s), dtype=self.dtype, name=f"deblock{idx}")
                    )
                else:
                    deblocks.append(
                        DownConvBNReLU(
                            num_upsample_filters[idx], int(np.round(1 / s)),
                            dtype=self.dtype, name=f"deblock{idx}",
                        )
                    )
        self.blocks = blocks
        self.deblocks = deblocks

        c_in = sum(num_upsample_filters) if num_upsample_filters else (
            num_filters[-1] if num_filters else self.input_channels
        )
        if len(upsample_strides) > len(layer_nums):
            self.extra_deblock = DeConvBNReLU(c_in, int(upsample_strides[-1]), dtype=self.dtype, name="deblock_extra")
        else:
            self.extra_deblock = None
        self.num_bev_features = c_in

    def __call__(self, batch, train=False):
        x = batch["spatial_features"]
        ups = []
        for i, level in enumerate(self.blocks):
            for layer in level:
                x = layer(x, train=train)
            ups.append(self.deblocks[i](x, train=train) if self.deblocks else x)

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif ups:
            x = ups[0]
        if self.extra_deblock is not None:
            x = self.extra_deblock(x, train=train)

        out = dict(batch)
        out["spatial_features_2d"] = x.astype(jnp.float32)
        return out


class BaseBEVBackboneV1(nn.Module):
    """Two-level variant over precomputed multi-scale 2D features
    (reference base_bev_backbone.py:115-204): deblocks upsample x_conv4 /
    blocks[1](x_conv5), the concat runs through blocks[0]."""

    model_cfg: Any
    input_channels: int = 0  # unused; widths come from the feature dict
    bf16: bool = False

    def setup(self):
        cfg = self.model_cfg
        self.dtype = jnp.bfloat16 if (self.bf16 or bool(cfg.get("BF16", False))) else None
        layer_nums = list(cfg["LAYER_NUMS"])
        num_filters = list(cfg["NUM_FILTERS"])
        assert len(layer_nums) == len(num_filters) == 2
        upsample_strides = list(cfg["UPSAMPLE_STRIDES"])
        num_upsample_filters = list(cfg["NUM_UPSAMPLE_FILTERS"])

        blocks = []
        deblocks = []
        for idx in range(2):
            level = [ConvBNReLU(num_filters[idx], dtype=self.dtype, name=f"block{idx}_0")]
            for k in range(layer_nums[idx]):
                level.append(ConvBNReLU(num_filters[idx], dtype=self.dtype,
                                        name=f"block{idx}_{k + 1}"))
            blocks.append(level)
            s = upsample_strides[idx]
            if s >= 1:
                deblocks.append(DeConvBNReLU(num_upsample_filters[idx], int(s),
                                             dtype=self.dtype, name=f"deblock{idx}"))
            else:
                deblocks.append(DownConvBNReLU(num_upsample_filters[idx],
                                               int(np.round(1 / s)),
                                               dtype=self.dtype, name=f"deblock{idx}"))
        self.blocks = blocks
        self.deblocks = deblocks
        self.num_bev_features = sum(num_upsample_filters)

    def __call__(self, batch, train=False):
        feats = batch["multi_scale_2d_features"]
        x_conv4, x_conv5 = feats["x_conv4"], feats["x_conv5"]
        ups = [self.deblocks[0](x_conv4, train=train)]
        x = x_conv5
        for layer in self.blocks[1]:
            x = layer(x, train=train)
        ups.append(self.deblocks[1](x, train=train))
        x = jnp.concatenate(ups, axis=-1)
        for layer in self.blocks[0]:
            x = layer(x, train=train)
        out = dict(batch)
        out["spatial_features_2d"] = x.astype(jnp.float32)
        return out
