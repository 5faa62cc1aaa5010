"""PointNet2MSG encoder-decoder backbone (PointRCNN's 3D backbone).

Behavioral counterpart of
/root/reference/pcdet/models/backbones_3d/pointnet2_backbone.py:9-96
(PointNet2MSG): a stack of multi-scale-grouping SA modules downsampling the
cloud, then FP modules propagating features back up to every input point.

TPU redesign: consumes the padded (B, N, C) batch directly (the reference
reshapes its stacked layout back to (B, N, C) anyway, asserting equal counts
— our padded collate IS that layout, with an explicit validity mask).
Emits point_features (B, N, C_out), point_coords (B, N, 3) and
point_coords_mask for the point head / ROI head stages.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2_modules import PointnetFPModule, PointnetSAModuleMSG


class PointNet2MSG(nn.Module):
    model_cfg: Any
    info: Any = None
    num_point_features: int = 4

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        points = out["points"]  # (B, N, C): xyz + features
        mask = out["points_mask"]
        xyz = points[..., 0:3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        sa_cfg = self.model_cfg["SA_CONFIG"]
        npoints = list(sa_cfg["NPOINTS"])
        l_xyz, l_feat, l_mask = [xyz], [feats], [mask]
        for k in range(len(npoints)):
            sa = PointnetSAModuleMSG(
                npoint=int(npoints[k]),
                radii=[float(r) for r in sa_cfg["RADIUS"][k]],
                nsamples=[int(n) for n in sa_cfg["NSAMPLE"][k]],
                mlps=[list(m) for m in sa_cfg["MLPS"][k]],
                use_xyz=bool(sa_cfg.get("USE_XYZ", True)),
                name=f"sa_{k}")
            nx, nf, nm = sa(l_xyz[k], l_feat[k], mask=l_mask[k], train=train)
            l_xyz.append(nx)
            l_feat.append(nf)
            l_mask.append(nm)

        fp_mlps = [list(m) for m in self.model_cfg["FP_MLPS"]]
        for i in range(len(fp_mlps) - 1, -1, -1):
            fp = PointnetFPModule(mlp=fp_mlps[i], name=f"fp_{i}")
            l_feat[i] = fp(l_xyz[i], l_xyz[i + 1], l_feat[i], l_feat[i + 1],
                           unknown_mask=l_mask[i], known_mask=l_mask[i + 1],
                           train=train)

        out["point_features"] = l_feat[0]  # (B, N, C_out)
        out["point_coords"] = xyz
        out["point_coords_mask"] = mask
        return out
