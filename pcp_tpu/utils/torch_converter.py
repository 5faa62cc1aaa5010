"""Torch (pcdet) checkpoint -> pcp_tpu variables converter.

The reference releases ``.pth`` checkpoints of the OpenPCDet models
(README "Model Zoo"); numerical parity against them requires translating the
torch state dict into our flax param/batch_stats trees:

  * Linear:       weight (out, in)        -> kernel (in, out)
  * Conv2d:       weight (out, in, kh, kw)-> kernel (kh, kw, in, out)  [NHWC]
  * ConvTranspose2d: weight (in, out, kh, kw) -> kernel (kh, kw, in, out),
    spatially flipped (flax ConvTranspose computes the gradient-of-conv with
    an unflipped kernel; torch's ConvTranspose flips — verified by test).
  * BatchNorm:    weight/bias -> scale/bias; running_mean/var -> batch_stats.

Covers the CenterPoint-pillar family used by every V2X config: DynPillarVFE
(pfn_layers.{i}.linear/norm), BaseBEVBackbone (blocks.{l}.{seq}/deblocks),
CenterHead (shared_conv, heads_list.{h}.{branch}), HunterJr (conv_input,
point_head/object_head MLPs, conv_weightor).
"""
import re

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_deconv(w):
    w = np.asarray(w)[:, :, ::-1, ::-1]  # flip spatial
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _put_bn(params, stats, path, sd, prefix):
    _set(params, path + ("scale",), sd[prefix + ".weight"])
    _set(params, path + ("bias",), sd[prefix + ".bias"])
    _set(stats, path + ("mean",), sd[prefix + ".running_mean"])
    _set(stats, path + ("var",), sd[prefix + ".running_var"])


def _convert_mlp(params, stats, sd, torch_prefix, our_path):
    """nn_make_mlp Sequential -> MLP module (lin_{i} / norm_{i})."""
    idx_lin = 0
    keys = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(re.escape(torch_prefix) + r"\.(\d+)\.weight$", k))}
    )
    for seq_idx in keys:
        w = sd[f"{torch_prefix}.{seq_idx}.weight"]
        if w.ndim != 2:
            continue
        _set(params, our_path + (f"lin_{idx_lin}", "kernel"), _t_linear(w))
        if f"{torch_prefix}.{seq_idx}.bias" in sd:
            _set(params, our_path + (f"lin_{idx_lin}", "bias"), sd[f"{torch_prefix}.{seq_idx}.bias"])
        bn_prefix = f"{torch_prefix}.{seq_idx + 1}"
        if f"{bn_prefix}.running_mean" in sd:
            _put_bn(params, stats, our_path + (f"norm_{idx_lin}",), sd, bn_prefix)
        idx_lin += 1


def convert_centerpoint_state_dict(sd, model_cfg):
    """Convert a pcdet CenterPoint state dict.

    Args:
        sd: {name: np.ndarray} torch state dict (tensors already .numpy()'d).
        model_cfg: the MODEL config (drives layer counts).
    Returns:
        {'params': ..., 'batch_stats': ...} matching build_network's tree.
    """
    params, stats = {}, {}

    # ---------------- VFE
    n_pfn = len(list(model_cfg["VFE"]["NUM_FILTERS"]))
    for i in range(n_pfn):
        base = f"vfe.pfn_layers.{i}"
        if f"{base}.linear.weight" in sd:
            _set(params, ("vfe", f"pfn_{i}", "linear", "kernel"), _t_linear(sd[f"{base}.linear.weight"]))
            if f"{base}.linear.bias" in sd:
                _set(params, ("vfe", f"pfn_{i}", "linear", "bias"), sd[f"{base}.linear.bias"])
            if f"{base}.norm.running_mean" in sd:
                _put_bn(params, stats, ("vfe", f"pfn_{i}", "norm"), sd, f"{base}.norm")

    # ---------------- backbone 2d
    bcfg = model_cfg["BACKBONE_2D"]
    layer_nums = list(bcfg.get("LAYER_NUMS", []))
    for l, n_layers in enumerate(layer_nums):
        # torch Sequential: ZeroPad(0), Conv(1), BN(2), ReLU(3), then
        # [Conv, BN, ReLU] * n -> conv k at index 3k+1, bn at 3k+2
        for k in range(n_layers + 1):
            conv_idx, bn_idx = 3 * k + 1, 3 * k + 2
            tp = f"backbone_2d.blocks.{l}.{conv_idx}.weight"
            if tp not in sd:
                continue
            path = ("backbone_2d", f"block{l}_{k}")
            _set(params, path + ("conv", "kernel"), _t_conv(sd[tp]))
            _put_bn(params, stats, path + ("norm",), sd, f"backbone_2d.blocks.{l}.{bn_idx}")
        # deblock
        dk = f"backbone_2d.deblocks.{l}.0.weight"
        if dk in sd:
            w = np.asarray(sd[dk])
            stride = list(bcfg["UPSAMPLE_STRIDES"])[l]
            path = ("backbone_2d", f"deblock{l}")
            if stride >= 1:  # ConvTranspose: torch weight (in, out, kh, kw)
                _set(params, path + ("deconv", "kernel"), _t_deconv(w))
            else:  # strided Conv
                _set(params, path + ("conv", "kernel"), _t_conv(w))
            _put_bn(params, stats, path + ("norm",), sd, f"backbone_2d.deblocks.{l}.1")

    # ---------------- dense head
    if "dense_head.shared_conv.0.weight" in sd:
        _set(params, ("dense_head", "shared_conv", "kernel"), _t_conv(sd["dense_head.shared_conv.0.weight"]))
        if "dense_head.shared_conv.0.bias" in sd:
            _set(params, ("dense_head", "shared_conv", "bias"), sd["dense_head.shared_conv.0.bias"])
        _put_bn(params, stats, ("dense_head", "shared_norm"), sd, "dense_head.shared_conv.1")

    head_cfg = model_cfg["DENSE_HEAD"]
    branches = (list(head_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]) + ["hm"]
                if "SEPARATE_HEAD_CFG" in head_cfg else [])
    n_heads = len(head_cfg.get("CLASS_NAMES_EACH_HEAD", [])) if branches else 0
    for h in range(n_heads):
        for name in branches:
            base = f"dense_head.heads_list.{h}.{name}"
            num_conv = (
                int(head_cfg["NUM_HM_CONV"])
                if name == "hm"
                else int(head_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"][name]["num_conv"])
            )
            for k in range(num_conv - 1):
                cw = f"{base}.{k}.0.weight"
                if cw not in sd:
                    continue
                path = ("dense_head", f"head_{h}", f"{name}_conv{k}")
                _set(params, path + ("kernel",), _t_conv(sd[cw]))
                if f"{base}.{k}.0.bias" in sd:
                    _set(params, path + ("bias",), sd[f"{base}.{k}.0.bias"])
                _put_bn(params, stats, ("dense_head", f"head_{h}", f"{name}_norm{k}"), sd, f"{base}.{k}.1")
            fw = f"{base}.{num_conv - 1}.weight"
            if fw in sd:
                path = ("dense_head", f"head_{h}", f"{name}_out")
                _set(params, path + ("kernel",), _t_conv(sd[fw]))
                _set(params, path + ("bias",), sd[f"{base}.{num_conv - 1}.bias"])

    # ---------------- anchor head (AnchorHeadSingle: 1x1 conv_cls/conv_box/
    # conv_dir_cls -> our Dense layers of the same names)
    for tname, ours in (("conv_cls", "conv_cls"), ("conv_box", "conv_box"),
                        ("conv_dir_cls", "conv_dir_cls")):
        tw = f"dense_head.{tname}.weight"
        if tw in sd:
            w = sd[tw]  # (out, in, 1, 1)
            _set(params, ("dense_head", ours, "kernel"),
                 w.reshape(w.shape[0], w.shape[1]).T)
            if f"dense_head.{tname}.bias" in sd:
                _set(params, ("dense_head", ours, "bias"), sd[f"dense_head.{tname}.bias"])

    # ---------------- corrector (HunterJr)
    if "corrector.conv_input.0.weight" in sd:
        _set(params, ("corrector", "conv_input", "conv", "kernel"), _t_conv(sd["corrector.conv_input.0.weight"]))
        _put_bn(params, stats, ("corrector", "conv_input", "norm"), sd, "corrector.conv_input.1")
        for mlp in ("local_feat_predictor", "seg", "reg_flow3d", "instance_embedding"):
            _convert_mlp(params, stats, sd, f"corrector.point_head.{mlp}", ("corrector", "point_head", mlp))
        for mlp in ("points_shape_encoder", "local_feat_encoder", "local_tf_decoder"):
            if any(k.startswith(f"corrector.object_head.{mlp}") for k in sd):
                _convert_mlp(params, stats, sd, f"corrector.object_head.{mlp}", ("corrector", "object_head", mlp))
        if "corrector.conv_weightor.0.0.weight" in sd:
            _set(params, ("corrector", "weightor_conv", "conv", "kernel"), _t_conv(sd["corrector.conv_weightor.0.0.weight"]))
            _put_bn(params, stats, ("corrector", "weightor_conv", "norm"), sd, "corrector.conv_weightor.0.1")
            _set(params, ("corrector", "weightor_out", "kernel"), _t_conv(sd["corrector.conv_weightor.1.weight"]))
            _set(params, ("corrector", "weightor_out", "bias"), sd["corrector.conv_weightor.1.bias"])

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path, model_cfg):
    """Load a pcdet .pth and convert. Requires torch (CPU ok)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    sd = {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    return convert_centerpoint_state_dict(sd, model_cfg)
