"""Self-calibrated-conv BEV backbones (NHWC) — the "pointpillar_jr" backbone.

Capability match for /root/reference/workspace/sc_conv.py (SCNet blocks,
published architecture): ``SCConvBackbone2dStride1`` and
``SCConvBackbone2dStride4``. Structure:

  stem  (conv s1|s2 + 3x SCBottleneck)
  skip  (1x1 conv of the stem output)
  main  (strided conv + 3x SCBottleneck + deconv back up)
  out   (3x3 conv over concat[main, skip], s1|s2)

SCConv (sc_conv.py:14-45): k2 = avgpool(r=4) -> conv -> BN, upsampled nearest
back; attention = sigmoid(x + up(k2)); out = k4(k3(x) * attention).
All BN eps 1e-3 / torch momentum 0.01 (flax 0.99).
"""
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 0

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=False, name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm"
        )(x)


class _ConvBNReLU(_ConvBN):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.relu(super().__call__(x, train=train))


class SCConv(nn.Module):
    """sc_conv.py:14-45; pooling_r = 4."""

    features: int
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        r = self.pooling_r
        pooled = nn.avg_pool(x, (r, r), strides=(r, r))
        k2 = _ConvBN(self.features, kernel=3, pad=1, name="k2")(pooled, train=train)
        up = jax.image.resize(k2, x.shape, method="nearest")
        att = jax.nn.sigmoid(x + up)
        k3 = _ConvBN(self.features, kernel=3, pad=1, name="k3")(x, train=train)
        return _ConvBN(self.features, kernel=3, pad=1, name="k4")(k3 * att, train=train)


class SCBottleneck(nn.Module):
    """sc_conv.py:48-125 with the backbone's usage (stride 1, no downsample,
    cardinality 1, bottleneck_width 32 -> group_width = planes // 2)."""

    planes: int

    @nn.compact
    def __call__(self, x, train=False):
        gw = int(self.planes * (32 / 64.0))
        a = nn.relu(_ConvBN(gw, kernel=1, name="conv1_a")(x, train=train))
        b = nn.relu(_ConvBN(gw, kernel=1, name="conv1_b")(x, train=train))
        a = nn.relu(_ConvBN(gw, kernel=3, pad=1, name="k1")(a, train=train))
        b = nn.relu(SCConv(gw, name="scconv")(b, train=train))
        out = _ConvBN(self.planes, kernel=1, name="conv3")(
            jnp.concatenate([a, b], axis=-1), train=train
        )
        return nn.relu(out + x)


class _DeconvBNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            use_bias=False, name="deconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm"
        )(x)
        return nn.relu(x)


class SCConvBackbone2dStride1(nn.Module):
    """sc_conv.py:130-168 — output at input stride."""

    model_cfg: Any
    input_channels: int
    bf16: bool = False  # accepted for builder uniformity; SCConv runs f32

    @nn.compact
    def __call__(self, batch, train=False):
        x = batch["spatial_features"]
        stem_ch = int(self.model_cfg["STEM_CHANNELS"])
        out_ch = int(self.model_cfg["NUM_BEV_FEATURES"])
        c_in = self.input_channels

        s = _ConvBNReLU(stem_ch, kernel=3, pad=1, name="stem_conv")(x, train=train)
        for i in range(3):
            s = SCBottleneck(stem_ch, name=f"stem_sc{i}")(s, train=train)
        skip = _ConvBNReLU(c_in, kernel=1, name="conv_skip")(s, train=train)
        m = _ConvBNReLU(c_in, kernel=3, stride=2, pad=1, name="main_down")(s, train=train)
        for i in range(3):
            m = SCBottleneck(c_in, name=f"main_sc{i}")(m, train=train)
        m = _DeconvBNReLU(c_in, name="main_up")(m, train=train)
        out = _ConvBNReLU(out_ch, kernel=3, pad=1, name="conv_out")(
            jnp.concatenate([m, skip], axis=-1), train=train
        )
        o = dict(batch)
        o["spatial_features_2d"] = out
        return o


class SCConvBackbone2dStride4(nn.Module):
    """sc_conv.py:171-208 — output at 4x input stride (stem s2 + out s2)."""

    model_cfg: Any
    input_channels: int
    bf16: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        x = batch["spatial_features"]
        out_ch = int(self.model_cfg["NUM_BEV_FEATURES"])
        stem_ch = self.input_channels * 2
        main_ch = stem_ch * 2

        s = _ConvBNReLU(stem_ch, kernel=3, stride=2, pad=1, name="stem_conv")(x, train=train)
        for i in range(3):
            s = SCBottleneck(stem_ch, name=f"stem_sc{i}")(s, train=train)
        skip = _ConvBNReLU(main_ch, kernel=1, name="conv_skip")(s, train=train)
        m = _ConvBNReLU(main_ch, kernel=3, stride=2, pad=1, name="main_down")(s, train=train)
        for i in range(3):
            m = SCBottleneck(main_ch, name=f"main_sc{i}")(m, train=train)
        m = _DeconvBNReLU(main_ch, name="main_up")(m, train=train)
        out = _ConvBNReLU(out_ch, kernel=3, stride=2, pad=1, name="conv_out")(
            jnp.concatenate([m, skip], axis=-1), train=train
        )
        o = dict(batch)
        o["spatial_features_2d"] = out
        return o
