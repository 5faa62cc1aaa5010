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
    folded: bool = False  # BN baked into conv kernel+bias (inference only)

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)) if self.kernel == 3 else "VALID", use_bias=self.folded,
            name="conv", dtype=self.dtype,
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


class DeConvBNReLU(nn.Module):
    features: int
    stride: int  # upsample factor
    dtype: Any = None
    folded: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.ConvTranspose(
            self.features, (self.stride, self.stride), strides=(self.stride, self.stride),
            padding="VALID", use_bias=self.folded, name="deconv", dtype=self.dtype,
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


class DownConvBNReLU(nn.Module):
    features: int
    stride: int  # downsample factor (kernel == stride)
    dtype: Any = None
    folded: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.stride, self.stride), strides=(self.stride, self.stride),
            padding="VALID", use_bias=self.folded, name="conv", dtype=self.dtype,
        )(x)
        if not self.folded:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, name="norm",
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


def fold_bn_variables(variables, module_name="backbone_2d"):
    """Bake BatchNorm into the preceding conv's kernel+bias (inference-time).

    Input: full model ``variables`` trained with FOLD_BN off. Output: new
    variables loadable by the same model built with ``FOLD_BN: True`` —
    every ``{conv|deconv, norm}`` pair under ``module_name`` becomes a
    biased conv with kernel scaled by gamma/sqrt(var+eps) on the
    out-channel axis (y = scale*(conv(x)) + (beta - scale*mean), exact in
    f32). Motivation: at inference BN is a per-channel affine that XLA
    usually fuses, but in the bf16 path flax BatchNorm's f32 stat math
    forces dtype round-trips between convs; folding removes the op
    entirely (ROADMAP perf item, VERDICT r3 weak #4).
    """
    import jax.numpy as jnp  # noqa: F811 (host-side, tiny arrays)

    params = dict(variables["params"])
    stats_all = dict(variables.get("batch_stats", {}))
    if module_name is None:  # variables of the standalone backbone module
        src_params, src_stats = params, stats_all
    else:
        src_params, src_stats = params[module_name], stats_all.get(module_name, {})
    sub = {k: dict(v) for k, v in src_params.items()}
    sub_stats = src_stats
    for blk, p in sub.items():
        conv_key = "deconv" if "deconv" in p else ("conv" if "conv" in p else None)
        if conv_key is None or "norm" not in p:
            continue
        norm = p["norm"]
        st = sub_stats[blk]["norm"]
        scale = norm["scale"] / jnp.sqrt(st["var"] + 1e-3)
        kernel = p[conv_key]["kernel"] * scale  # out-channels are the last axis
        bias = norm["bias"] - st["mean"] * scale
        p[conv_key] = {"kernel": kernel, "bias": bias}
        del p["norm"]
        sub[blk] = p
    if module_name is None:
        params = sub
        stats_all = {}
    else:
        params[module_name] = sub
        stats_all.pop(module_name, None)
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables:
        out["batch_stats"] = stats_all
    return out


def _wpack_levels(cfg):
    """Level indices eligible for width-packing under ``W_PACK: True``.

    Mechanism (ROADMAP perf item, VERDICT r4 #4): convs with <=64 output
    channels half-fill the 128-wide MXU and measure ~28 TFLOP/s effective vs
    ~113 at 128ch (tools/exp_backbone_blocks.py, block0 5.44 ms of the 9 ms
    backbone). Folding W-pairs into channels doubles the MAC count (the
    structured packed kernel is half zeros, executed dense) but runs at the
    efficient width — a net win when the narrow conv runs below half the
    wide conv's efficiency, which block0 does by ~4x.
    """
    if not cfg.get("W_PACK", False):
        return set()
    nf = list(cfg.get("NUM_FILTERS", []))
    st = list(cfg.get("LAYER_STRIDES", []))
    return {i for i in range(len(nf)) if nf[i] <= 64 and st[i] in (1, 2)}


def _pack_kernel(W, strided):
    """(3,3,Ci,Co) conv kernel -> (3,3,2Ci,2Co) W-packed structured kernel.

    Packed layout: channel blocks [w-even | w-odd] (a free reshape of NHWC:
    (B,H,W,C)->(B,H,W/2,2C)). The packed conv reproduces the original conv
    EXACTLY (zeros elsewhere make the extra taps inert; the packed pad
    column's even slot is never read because its kernel entries are zero).
    ``strided`` selects the stride-2 tap pattern for the block's first conv.
    """
    import numpy as _np

    W = _np.asarray(W)
    kh, kw, ci, co = W.shape
    assert (kh, kw) == (3, 3), f"W_PACK supports 3x3 kernels, got {(kh, kw)}"
    K = _np.zeros((3, 3, 2 * ci, 2 * co), W.dtype)
    # even-parity outputs: identical pattern for s1 and s2
    K[:, 0, ci:, :co] = W[:, 0]   # x[2j-1] = (j-1, odd)
    K[:, 1, :ci, :co] = W[:, 1]   # x[2j]   = (j, even)
    K[:, 1, ci:, :co] = W[:, 2]   # x[2j+1] = (j, odd)
    if strided:
        # y[2J+1] taps x[4J+1..4J+3] = (2J,odd),(2J+1,even),(2J+1,odd)
        K[:, 1, ci:, co:] = W[:, 0]
        K[:, 2, :ci, co:] = W[:, 1]
        K[:, 2, ci:, co:] = W[:, 2]
    else:
        # y[2j+1] taps x[2j..2j+2] = (j,even),(j,odd),(j+1,even)
        K[:, 1, :ci, co:] = W[:, 0]
        K[:, 1, ci:, co:] = W[:, 1]
        K[:, 2, :ci, co:] = W[:, 2]
    return K


def w_pack_variables(variables, model_cfg, module_name="backbone_2d"):
    """Transform standard-trained backbone weights into ``W_PACK: True`` form.

    Same deployment pattern as :func:`fold_bn_variables`: train with the flag
    off, transform once at load time, run the packed module for inference.
    Kernels become structured (3,3,2Ci,2Co); per-channel BN affines / stats
    (or folded conv biases) tile x2 because both parity blocks carry the same
    original channels. Exact in f32 (differential-tested)."""
    import numpy as _np

    packed = _wpack_levels(model_cfg)
    if not packed:
        return variables
    layer_nums = list(model_cfg.get("LAYER_NUMS", []))
    layer_strides = list(model_cfg.get("LAYER_STRIDES", []))

    def tile(v):
        return _np.concatenate([_np.asarray(v), _np.asarray(v)], axis=0)

    out = {k: dict(v) for k, v in variables.items()}
    for col in ("params", "batch_stats"):
        if col not in out:
            continue
        tree = out[col] if module_name is None else out[col].get(module_name, {})
        tree = {k: v for k, v in tree.items()}
        for idx in packed:
            for k in range(layer_nums[idx] + 1):
                blk = f"block{idx}_{k}"
                if blk not in tree:
                    continue
                p = {kk: dict(vv) for kk, vv in tree[blk].items()}
                if "conv" in p:
                    q = dict(p["conv"])
                    if "kernel" in q:
                        q["kernel"] = _pack_kernel(
                            q["kernel"], strided=(k == 0 and layer_strides[idx] == 2))
                    if "bias" in q:  # folded-BN conv
                        q["bias"] = tile(q["bias"])
                    p["conv"] = q
                if "norm" in p:
                    p["norm"] = {kk: tile(vv) for kk, vv in p["norm"].items()}
                tree[blk] = p
        if module_name is None:
            out[col] = tree
        else:
            new_col = dict(out[col])
            new_col[module_name] = tree
            out[col] = new_col
    return out


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int
    bf16: bool = False

    def setup(self):
        cfg = self.model_cfg
        # BF16: True runs the conv stack in bfloat16 (params/BN stats stay
        # f32; output cast back to f32) — MXU-native inference mode
        self.dtype = jnp.bfloat16 if (self.bf16 or bool(cfg.get("BF16", False))) else None
        # FOLD_BN: True expects fold_bn_variables()-transformed params
        # (inference-only; BN replaced by a conv bias)
        folded = bool(cfg.get("FOLD_BN", False))
        layer_nums = list(cfg.get("LAYER_NUMS", []))
        layer_strides = list(cfg.get("LAYER_STRIDES", []))
        num_filters = list(cfg.get("NUM_FILTERS", []))
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
        num_upsample_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []))

        # W_PACK: True — inference-only MXU-width fix for narrow (<=64ch)
        # levels: run the level's convs on a (H, W/2, 2C) width-packed layout
        # with structured kernels (exact math; see w_pack_variables). Load
        # standard weights through w_pack_variables(); training asserts off.
        self.packed_levels = _wpack_levels(cfg)
        blocks = []
        deblocks = []
        for idx in range(len(layer_nums)):
            mult = 2 if idx in self.packed_levels else 1
            level = [ConvBNReLU(num_filters[idx] * mult, stride=layer_strides[idx],
                                dtype=self.dtype, folded=folded, name=f"block{idx}_0")]
            for k in range(layer_nums[idx]):
                level.append(ConvBNReLU(num_filters[idx] * mult, dtype=self.dtype,
                                        folded=folded, name=f"block{idx}_{k + 1}"))
            blocks.append(level)
            if upsample_strides:
                s = upsample_strides[idx]
                if s >= 1:
                    deblocks.append(
                        DeConvBNReLU(num_upsample_filters[idx], int(s), dtype=self.dtype,
                                     folded=folded, name=f"deblock{idx}")
                    )
                else:
                    deblocks.append(
                        DownConvBNReLU(
                            num_upsample_filters[idx], int(np.round(1 / s)),
                            dtype=self.dtype, folded=folded, name=f"deblock{idx}",
                        )
                    )
        self.blocks = blocks
        self.deblocks = deblocks

        c_in = sum(num_upsample_filters) if num_upsample_filters else (
            num_filters[-1] if num_filters else self.input_channels
        )
        if len(upsample_strides) > len(layer_nums):
            self.extra_deblock = DeConvBNReLU(c_in, int(upsample_strides[-1]), dtype=self.dtype,
                                              folded=folded, name="deblock_extra")
        else:
            self.extra_deblock = None
        self.num_bev_features = c_in

    def __call__(self, batch, train=False):
        x = batch["spatial_features"]
        ups = []
        for i, level in enumerate(self.blocks):
            packed = i in self.packed_levels
            if packed:
                assert not train, "W_PACK is inference-only (BN stats are per-channel)"
                b, h, w, c = x.shape
                assert w % 2 == 0, f"W_PACK needs even W, got {w}"
                x = x.reshape(b, h, w // 2, 2 * c)
            for layer in level:
                x = layer(x, train=train)
            if packed:
                b, h, wp, cp = x.shape
                x = x.reshape(b, h, wp, 2, cp // 2).reshape(b, h, wp * 2, cp // 2)
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
