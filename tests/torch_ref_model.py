"""Independent torch implementation of the CenterPoint-pillar stack.

Built for the full-model differential test: same architecture and state-dict
key layout as the reference pcdet models (so ``torch_converter`` consumes it
exactly like a released checkpoint), but written from the documented behavior
— dynamic pillar VFE (dynamic_pillar_vfe.py:94-147), BaseBEVBackbone
(base_bev_backbone.py:6-112), CenterHead (center_head.py:50-99) — using plain
torch ops (scatter_reduce in place of torch_scatter).
"""
import numpy as np
import torch
import torch.nn as nn


class TorchPFNLayer(nn.Module):
    def __init__(self, in_ch, out_ch, last=False):
        super().__init__()
        self.last = last
        out = out_ch if last else out_ch // 2
        self.linear = nn.Linear(in_ch, out, bias=False)
        self.norm = nn.BatchNorm1d(out, eps=1e-3, momentum=0.01)

    def forward(self, x, unq_inv, n_pillars):
        x = torch.relu(self.norm(self.linear(x)))
        pooled = torch.full((n_pillars, x.shape[1]), -1e9, dtype=x.dtype)
        pooled = pooled.scatter_reduce(
            0, unq_inv[:, None].expand(-1, x.shape[1]), x, reduce="amax"
        )
        pooled = torch.where(pooled <= -1e9, torch.zeros_like(pooled), pooled)
        if self.last:
            return None, pooled
        return torch.cat([x, pooled[unq_inv]], dim=1), pooled


class TorchDynPillarVFE(nn.Module):
    def __init__(self, num_raw, filters, voxel_size, pc_range, grid_size):
        super().__init__()
        self.voxel_size = voxel_size
        self.pc_range = pc_range
        self.grid_size = grid_size
        in_ch = num_raw + 6  # + f_cluster(3) + f_center(3)
        self.pfn_layers = nn.ModuleList()
        for i, f in enumerate(filters):
            last = i == len(filters) - 1
            self.pfn_layers.append(TorchPFNLayer(in_ch, f, last=last))
            in_ch = f if last else f  # non-last output = f//2 * 2 (concat)

    def forward(self, points_list):
        """points_list: per-sample (N_i, C) float tensors (all in range).
        Returns (B, C_out, ny, nx) dense BEV."""
        vx, vy = self.voxel_size[:2]
        x0, y0 = self.pc_range[0], self.pc_range[1]
        nx, ny = self.grid_size[:2]
        bev = []
        for pts in points_list:
            coords = torch.floor((pts[:, 0:2] - torch.tensor([x0, y0])) / torch.tensor([vx, vy])).long()
            pid = coords[:, 1] * nx + coords[:, 0]
            unq, unq_inv = torch.unique(pid, return_inverse=True)
            n_pillars = unq.shape[0]

            xyz = pts[:, 0:3]
            ones = torch.ones(len(pts), 1)
            sums = torch.zeros(n_pillars, 3).index_add_(0, unq_inv, xyz)
            cnt = torch.zeros(n_pillars, 1).index_add_(0, unq_inv, ones)
            mean = sums / cnt.clamp(min=1.0)
            f_cluster = xyz - mean[unq_inv]
            f_center = torch.stack(
                [
                    xyz[:, 0] - (coords[:, 0].float() * vx + vx / 2 + x0),
                    xyz[:, 1] - (coords[:, 1].float() * vy + vy / 2 + y0),
                    xyz[:, 2] - (self.voxel_size[2] / 2 + self.pc_range[2]),
                ],
                dim=1,
            )
            feats = torch.cat([pts, f_cluster, f_center], dim=1)
            pooled = None
            for pfn in self.pfn_layers:
                feats, pooled = pfn(feats, unq_inv, n_pillars)
            grid = torch.zeros(nx * ny, pooled.shape[1])
            grid[unq] = pooled
            bev.append(grid.view(ny, nx, -1).permute(2, 0, 1))
        return torch.stack(bev)


class TorchBEVBackbone(nn.Module):
    def __init__(self, in_ch, layer_nums, strides, filters, up_strides, up_filters):
        super().__init__()
        self.blocks = nn.ModuleList()
        self.deblocks = nn.ModuleList()
        c_in = [in_ch] + list(filters[:-1])
        for l, n in enumerate(layer_nums):
            layers = [
                nn.ZeroPad2d(1),
                nn.Conv2d(c_in[l], filters[l], 3, stride=strides[l], bias=False),
                nn.BatchNorm2d(filters[l], eps=1e-3, momentum=0.01),
                nn.ReLU(),
            ]
            for _ in range(n):
                layers += [
                    nn.Conv2d(filters[l], filters[l], 3, padding=1, bias=False),
                    nn.BatchNorm2d(filters[l], eps=1e-3, momentum=0.01),
                    nn.ReLU(),
                ]
            self.blocks.append(nn.Sequential(*layers))
            s = up_strides[l]
            if s >= 1:
                self.deblocks.append(
                    nn.Sequential(
                        nn.ConvTranspose2d(filters[l], up_filters[l], int(s), stride=int(s), bias=False),
                        nn.BatchNorm2d(up_filters[l], eps=1e-3, momentum=0.01),
                        nn.ReLU(),
                    )
                )
            else:
                k = int(round(1 / s))
                self.deblocks.append(
                    nn.Sequential(
                        nn.Conv2d(filters[l], up_filters[l], k, stride=k, bias=False),
                        nn.BatchNorm2d(up_filters[l], eps=1e-3, momentum=0.01),
                        nn.ReLU(),
                    )
                )

    def forward(self, x):
        ups = []
        for block, deblock in zip(self.blocks, self.deblocks):
            x = block(x)
            ups.append(deblock(x))
        return torch.cat(ups, dim=1)


class TorchSeparateHead(nn.Module):
    def __init__(self, in_ch, head_dict, use_bias):
        super().__init__()
        for name, spec in head_dict.items():
            out_ch, num_conv = spec["out_channels"], spec["num_conv"]
            layers = []
            c = in_ch
            for _ in range(num_conv - 1):
                layers.append(
                    nn.Sequential(
                        nn.Conv2d(c, in_ch, 3, padding=1, bias=use_bias),
                        nn.BatchNorm2d(in_ch, eps=1e-3, momentum=0.01),
                        nn.ReLU(),
                    )
                )
                c = in_ch
            layers.append(nn.Conv2d(c, out_ch, 3, padding=1, bias=True))
            setattr(self, name, nn.Sequential(*layers))
        self.names = list(head_dict.keys())

    def forward(self, x):
        return {name: getattr(self, name)(x) for name in self.names}


class TorchCenterHead(nn.Module):
    def __init__(self, in_ch, shared_ch, head_dict, num_hm_conv, num_class=1, use_bias=True):
        super().__init__()
        self.shared_conv = nn.Sequential(
            nn.Conv2d(in_ch, shared_ch, 3, padding=1, bias=use_bias),
            nn.BatchNorm2d(shared_ch, eps=1e-3, momentum=0.01),
            nn.ReLU(),
        )
        hd = dict(head_dict)
        hd["hm"] = {"out_channels": num_class, "num_conv": num_hm_conv}
        self.heads_list = nn.ModuleList([TorchSeparateHead(shared_ch, hd, use_bias)])

    def forward(self, x):
        x = self.shared_conv(x)
        return [head(x) for head in self.heads_list]


class TorchCenterPointPillar(nn.Module):
    """vfe -> scatter(implicit) -> backbone_2d -> dense_head, state-dict keys
    matching pcdet (vfe.pfn_layers..., backbone_2d.blocks..., dense_head...)."""

    def __init__(self, model_cfg, grid_size, pc_range, voxel_size, num_raw, num_class=1):
        super().__init__()
        vcfg, bcfg, hcfg = model_cfg["VFE"], model_cfg["BACKBONE_2D"], model_cfg["DENSE_HEAD"]
        self.vfe = TorchDynPillarVFE(
            num_raw, list(vcfg["NUM_FILTERS"]), voxel_size, pc_range, grid_size
        )
        self.backbone_2d = TorchBEVBackbone(
            list(vcfg["NUM_FILTERS"])[-1],
            list(bcfg["LAYER_NUMS"]),
            list(bcfg["LAYER_STRIDES"]),
            list(bcfg["NUM_FILTERS"]),
            list(bcfg["UPSAMPLE_STRIDES"]),
            list(bcfg["NUM_UPSAMPLE_FILTERS"]),
        )
        self.dense_head = TorchCenterHead(
            sum(bcfg["NUM_UPSAMPLE_FILTERS"]),
            int(hcfg["SHARED_CONV_CHANNEL"]),
            dict(hcfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"]),
            int(hcfg["NUM_HM_CONV"]),
            num_class=num_class,
            use_bias=bool(hcfg.get("USE_BIAS_BEFORE_NORM", True)),
        )

    @torch.no_grad()
    def forward(self, points_list):
        bev = self.vfe(points_list)
        feat = self.backbone_2d(bev)
        return self.dense_head(feat), bev, feat


def randomize_bn_stats(model, rng):
    """Give running stats non-trivial values so eval-mode BN is exercised."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.tensor(rng.normal(0, 0.5, m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, m.running_var.shape), dtype=torch.float32))
