"""Component-level timing of the flagship pillar pipeline on the real chip.

Times each stage in isolation with bench-identical shapes using the
scalar-sync recipe (dispatch ITERS batches, sync once, subtract tunnel RTT).
Usage: python tools/profile_components.py [stage ...]
"""
import sys
import time

import numpy as np

BATCH = 8
NPOINTS = 32768
GRID = 512
ITERS = 16


def timed(fn, inputs, name):
    import jax

    r = fn(*inputs[0])
    jax.tree_util.tree_map(lambda x: np.asarray(x), r)  # compile+warm

    import jax.numpy as jnp

    trivial = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(trivial(jnp.zeros(())))
    t0 = time.perf_counter()
    _ = np.asarray(trivial(jnp.zeros(())))
    rtt = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            r = fn(*inputs[i % len(inputs)])
        leaf = jax.tree_util.tree_leaves(r)[0]
        _ = np.asarray(jnp.sum(leaf) if hasattr(leaf, "shape") else leaf)
        best = min(best, time.perf_counter() - t0)
    ms = max(best - rtt, 0.0) / ITERS * 1e3
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    stages = sys.argv[1:] or [
        "sort", "scan4", "scan64max", "pallas", "pfn", "backbone", "backbone_wpack",
        "headconv", "decode", "nms", "vfe_full",
    ]

    rng = np.random.default_rng(0)
    pts = np.zeros((2, BATCH, NPOINTS, 11), dtype=np.float32)
    centers = rng.uniform(-45, 45, size=(2, BATCH, 64, 2))
    idx = rng.integers(0, 64, size=NPOINTS)
    pts[..., 0:2] = centers[:, :, idx, :] + rng.normal(0, 3.0, size=(2, BATCH, NPOINTS, 2))
    pts[..., 2] = rng.uniform(-3.0, -0.5, size=(2, BATCH, NPOINTS))

    coords = np.floor((pts[..., 0:2] + 51.2) / 0.2).astype(np.int32)
    okm = ((coords >= 0) & (coords < GRID)).all(-1)
    pid = np.where(okm, coords[..., 1] * GRID + coords[..., 0], GRID * GRID).astype(np.int32)

    if "sort" in stages:
        from pcp_tpu.ops.sorted_segments import sort_by_pid

        f = jax.jit(lambda p, x: sort_by_pid(p, [x]))
        timed(f, [(jnp.asarray(pid[i]), jnp.asarray(pts[i])) for i in range(2)], "sort_by_pid (1 payload 11ch)")

    pid_s = np.sort(pid, axis=-1)
    if "scan4" in stages:
        from pcp_tpu.ops.sorted_segments import segment_end_index, segment_total_to_points

        f = jax.jit(
            lambda p, x: segment_total_to_points(x, p, jnp.add, segment_end_index(p))
        )
        timed(
            f,
            [(jnp.asarray(pid_s[i]), jnp.asarray(pts[i][..., :4])) for i in range(2)],
            "seg scan sum 4ch (+end idx)",
        )

    if "scan64max" in stages:
        from pcp_tpu.ops.sorted_segments import segment_end_index, segment_total_to_points

        feats64 = rng.uniform(0, 1, size=(2, BATCH, NPOINTS, 64)).astype(np.float32)
        f = jax.jit(
            lambda p, x: segment_total_to_points(x, p, jnp.maximum, segment_end_index(p))
        )
        timed(
            f,
            [(jnp.asarray(pid_s[i]), jnp.asarray(feats64[i])) for i in range(2)],
            "seg scan max 64ch (+end idx)",
        )

    if "pallas" in stages:
        from pcp_tpu.ops.pallas.bev_scatter import bev_scatter_max_sorted, use_interpret

        feats64 = rng.uniform(0, 1, size=(2, BATCH, NPOINTS, 64)).astype(np.float32)
        f = jax.jit(
            lambda x, p: bev_scatter_max_sorted(x, p, GRID, GRID, use_interpret())
        )
        timed(
            f,
            [(jnp.asarray(feats64[i]), jnp.asarray(pid_s[i])) for i in range(2)],
            "pallas bev scatter-max 64ch",
        )

    if "pfn" in stages:
        import flax.linen as nn

        class PFN(nn.Module):
            @nn.compact
            def __call__(self, x, m):
                from pcp_tpu.models.model_utils.norm import MaskedBatchNorm

                x = nn.Dense(64, use_bias=False)(x)
                x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3)(x, mask=m, use_running_average=True)
                return nn.relu(x)

        mod = PFN()
        x0 = jnp.asarray(pts[0].reshape(-1, 11))
        m0 = jnp.ones((BATCH * NPOINTS,), bool)
        v = mod.init(jax.random.PRNGKey(0), x0, m0)
        f = jax.jit(lambda x: mod.apply(v, x, m0))
        timed(f, [(jnp.asarray(pts[i].reshape(-1, 11)),) for i in range(2)], "PFN linear+BN+relu 11->64")

    if "backbone" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        bb = BaseBEVBackbone(model_cfg=cfg.MODEL.BACKBONE_2D, input_channels=64)
        bev = rng.normal(0, 1, size=(2, BATCH, GRID, GRID, 64)).astype(np.float32)
        v = bb.init(jax.random.PRNGKey(0), {"spatial_features": jnp.asarray(bev[0]), "batch_size": BATCH}, train=False)
        f = jax.jit(lambda x: bb.apply(v, {"spatial_features": x, "batch_size": BATCH}, train=False)["spatial_features_2d"])
        timed(f, [(jnp.asarray(bev[i]),) for i in range(2)], "BEV backbone 512x512x64")

    if "backbone_wpack" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        cfg.MODEL.BACKBONE_2D["W_PACK"] = True
        bb = BaseBEVBackbone(model_cfg=cfg.MODEL.BACKBONE_2D, input_channels=64)
        bev = rng.normal(0, 1, size=(2, BATCH, GRID, GRID, 64)).astype(np.float32)
        v = bb.init(jax.random.PRNGKey(0), {"spatial_features": jnp.asarray(bev[0]), "batch_size": BATCH}, train=False)
        f = jax.jit(lambda x: bb.apply(v, {"spatial_features": x, "batch_size": BATCH}, train=False)["spatial_features_2d"])
        timed(f, [(jnp.asarray(bev[i]),) for i in range(2)], "BEV backbone 512x512x64 W_PACK")

    if "backbone_bf16" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        cfg.MODEL.BACKBONE_2D["BF16"] = True
        bb = BaseBEVBackbone(model_cfg=cfg.MODEL.BACKBONE_2D, input_channels=64)
        bev = rng.normal(0, 1, size=(2, BATCH, GRID, GRID, 64)).astype(np.float32)
        v = bb.init(jax.random.PRNGKey(0), {"spatial_features": jnp.asarray(bev[0]), "batch_size": BATCH}, train=False)
        f = jax.jit(lambda x: bb.apply(v, {"spatial_features": x, "batch_size": BATCH}, train=False)["spatial_features_2d"])
        timed(f, [(jnp.asarray(bev[i]),) for i in range(2)], "BEV backbone 512x512x64 bf16")

    if "headconv_bf16" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.dense_heads.center_head import CenterHead

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        cfg.MODEL.DENSE_HEAD["BF16"] = True
        head = CenterHead(
            model_cfg=cfg.MODEL.DENSE_HEAD,
            input_channels=384,
            num_class=1,
            class_names=["car"],
            grid_size=(GRID, GRID, 1),
            point_cloud_range=(-51.2, -51.2, -8.0, 51.2, 51.2, 0.0),
            voxel_size=(0.2, 0.2, 8.0),
        )
        feat = rng.normal(0, 1, size=(2, BATCH, GRID // 4, GRID // 4, 384)).astype(np.float32)
        batch0 = {"spatial_features_2d": jnp.asarray(feat[0]), "batch_size": BATCH}
        v = head.init(jax.random.PRNGKey(0), batch0, train=False)
        f = jax.jit(lambda x: head.apply(v, {"spatial_features_2d": x, "batch_size": BATCH}, train=False)["final_box_dicts"]["pred_scores"])
        timed(f, [(jnp.asarray(feat[i]),) for i in range(2)], "CenterHead full bf16")

    if "headconv" in stages or "decode" in stages or "nms" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.dense_heads.center_head import CenterHead

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        head = CenterHead(
            model_cfg=cfg.MODEL.DENSE_HEAD,
            input_channels=384,
            num_class=1,
            class_names=["car"],
            grid_size=(GRID, GRID, 1),
            point_cloud_range=(-51.2, -51.2, -8.0, 51.2, 51.2, 0.0),
            voxel_size=(0.2, 0.2, 8.0),
        )
        feat = rng.normal(0, 1, size=(2, BATCH, GRID // 4, GRID // 4, 384)).astype(np.float32)
        batch0 = {"spatial_features_2d": jnp.asarray(feat[0]), "batch_size": BATCH}
        v = head.init(jax.random.PRNGKey(0), batch0, train=False)
        f = jax.jit(lambda x: head.apply(v, {"spatial_features_2d": x, "batch_size": BATCH}, train=False)["final_box_dicts"]["pred_scores"])
        timed(f, [(jnp.asarray(feat[i]),) for i in range(2)], "CenterHead full (conv+decode+NMS)")

    if "nms" in stages:
        from pcp_tpu.ops.nms import class_agnostic_nms

        k = 500
        boxes = rng.uniform(-50, 50, size=(2, BATCH, k, 7)).astype(np.float32)
        boxes[..., 3:5] = rng.uniform(1, 6, size=(2, BATCH, k, 2))
        boxes[..., 5] = 1.6
        scores = rng.uniform(0, 1, size=(2, BATCH, k)).astype(np.float32)
        nms_cfg = {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 1000, "NMS_POST_MAXSIZE": 83,
                   "NMS_TYPE": "nms_gpu", "NMS_IMPL_MAX_CANDIDATES": 256}
        f = jax.jit(
            lambda b, s: jax.vmap(lambda bb, ss: class_agnostic_nms(bb, ss, ss > 0.1, nms_cfg, score_thresh=0.1))(b, s)
        )
        timed(f, [(jnp.asarray(boxes[i]), jnp.asarray(scores[i])) for i in range(2)], "class_agnostic_nms b8 k500 cap256")
        nms_cfg2 = dict(nms_cfg, NMS_IMPL_MAX_CANDIDATES=0)
        f2 = jax.jit(
            lambda b, s: jax.vmap(lambda bb, ss: class_agnostic_nms(bb, ss, ss > 0.1, nms_cfg2, score_thresh=0.1))(b, s)
        )
        timed(f2, [(jnp.asarray(boxes[i]), jnp.asarray(scores[i])) for i in range(2)], "class_agnostic_nms b8 k500 exact")

    if "vfe_full" in stages:
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.vfe.dynamic_pillar_vfe import DynamicPillarVFE

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        vfe = DynamicPillarVFE(
            model_cfg=cfg.MODEL.VFE,
            num_point_features=11,
            voxel_size=(0.2, 0.2, 8.0),
            grid_size=(GRID, GRID, 1),
            point_cloud_range=(-51.2, -51.2, -8.0, 51.2, 51.2, 0.0),
        )
        m = jnp.ones((BATCH, NPOINTS), bool)
        b0 = {"points": jnp.asarray(pts[0]), "points_mask": m, "batch_size": BATCH}
        v = vfe.init(jax.random.PRNGKey(0), b0, train=False)
        f = jax.jit(lambda x: vfe.apply(v, {"points": x, "points_mask": m, "batch_size": BATCH}, train=False)["pillar_features"])
        timed(f, [(jnp.asarray(pts[i]),) for i in range(2)], "VFE full (sort+scans+PFN+pallas)")


if __name__ == "__main__":
    main()
