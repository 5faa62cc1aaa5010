"""Per-block timing of the BEV backbone on the real chip (+ layout variants).

Breaks the round-3 "9.0 ms backbone" into block0 (64ch @ 256^2 after the
stride-2 input conv — the half-MXU suspect), block1 (128ch @ 128^2),
block2 (256ch @ 64^2) and the deblock+concat tail, then times layout
variants of the hot block:

  * f32 baseline (XLA default layout)
  * bf16 activations (halved HBM traffic between convs)
  * width-packed (fold 2x W into C: 64ch -> 128ch lanes full, 2x padded MACs)

Usage: python tools/exp_backbone_blocks.py [blocks|variants|all]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
BATCH = 8
ITERS = 16


def timed(fn, inputs, name):
    import jax
    import jax.numpy as jnp

    r = fn(*inputs[0])
    jax.tree_util.tree_map(lambda x: np.asarray(x), r)
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
        _ = np.asarray(jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - rtt, 0.0) / ITERS * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def conv_chain(channels, n_convs, stride_first, dtype=None, bn="bn"):
    """A [Conv s / Conv 1]*n chain like one backbone block.

    bn: 'bn' = BatchNorm(inference) like the real backbone; 'bias' = BN folded
    into a conv bias (the inference-time BN-baking candidate); 'none' = conv
    only (isolates whether BN is what de-rates the bf16 path).
    """
    import flax.linen as nn

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for k in range(n_convs):
                x = nn.Conv(channels, (3, 3), strides=(stride_first if k == 0 else 1,) * 2,
                            padding=((1, 1), (1, 1)), use_bias=(bn == "bias"), dtype=dtype,
                            name=f"c{k}")(x)
                if bn == "bn":
                    x = nn.BatchNorm(use_running_average=True, momentum=0.99, epsilon=1e-3,
                                     dtype=dtype, name=f"n{k}")(x)
                x = nn.relu(x)
            return x

    return Chain()


def main():
    import jax
    import jax.numpy as jnp

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)

    def run(mod, shape, name, dtype=np.float32):
        x = [jnp.asarray(rng.normal(0, 1, size=(BATCH,) + shape).astype(dtype)) for _ in range(2)]
        v = mod.init(jax.random.PRNGKey(0), x[0])
        f = jax.jit(lambda a: mod.apply(v, a))
        return timed(f, [(xi,) for xi in x], name)

    if which in ("blocks", "all"):
        # the flagship config: LAYER_NUMS [3,5,5], filters [64,128,256]
        run(conv_chain(64, 4, 2), (512, 512, 64), "block0: s2 + 3x conv 64ch (512^2->256^2)")
        run(conv_chain(128, 6, 2), (256, 256, 64), "block1: s2 + 5x conv 128ch (->128^2)")
        run(conv_chain(256, 6, 2), (128, 128, 128), "block2: s2 + 5x conv 256ch (->64^2)")

    if which in ("variants", "all"):
        run(conv_chain(64, 4, 2, dtype=jnp.bfloat16), (512, 512, 64),
            "block0 bf16 activations")
        # width-packed block0: all convs become 128ch on a half-width grid.
        # Equivalent math needs structured (half-zero) 3x3 kernels; for the
        # TIMING question only the shapes matter.
        run(conv_chain(128, 4, 2), (512, 256, 128), "block0 width-packed (128ch, W/2)")
        run(conv_chain(128, 4, 2, dtype=jnp.bfloat16), (512, 256, 128),
            "block0 width-packed bf16")
        # fully-packed: 2x2 space-to-depth -> 256ch quarter-area
        run(conv_chain(256, 4, 2), (256, 256, 256), "block0 2x2-packed (256ch, HW/4)")
        # channel-only widening for reference: what would 128-out block0 cost
        run(conv_chain(128, 4, 2), (512, 512, 64), "block0 if 128-wide (not equivalent)")

    if which in ("dtype", "all"):
        # Why is e2e bf16 SLOWER than f32 (9.13 vs 8.85 ms)? f32 convs lower
        # to 3-pass bf16 on the MXU (~66 TFLOP/s ceiling — exactly what the
        # 8.85 ms backbone hits), so real bf16 should be up to ~3x. Isolate
        # BN's role and the input-cast cost per block shape.
        for ch, n, s, shape, tag in ((64, 4, 2, (512, 512, 64), "block0"),
                                     (128, 6, 2, (256, 256, 64), "block1"),
                                     (256, 6, 2, (128, 128, 128), "block2")):
            for bn in ("bn", "bias", "none"):
                for dt, dtag in ((None, "f32"), (jnp.bfloat16, "bf16")):
                    run(conv_chain(ch, n, s, dtype=dt, bn=bn), shape,
                        f"{tag} {bn:4s} {dtag}")
        # bf16 input too (no leading cast inside the jit)
        run(conv_chain(64, 4, 2, dtype=jnp.bfloat16, bn="bias"), (512, 512, 64),
            "block0 bias bf16 + bf16 input", dtype=jnp.bfloat16)

    if which in ("e2e", "all"):
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        for bf16, tag in ((False, "f32"), (True, "bf16")):
            c = dict(cfg.MODEL.BACKBONE_2D)
            c["BF16"] = bf16
            bb = BaseBEVBackbone(model_cfg=c, input_channels=64)
            x = [jnp.asarray(rng.normal(0, 1, size=(BATCH, 512, 512, 64)).astype(np.float32))
                 for _ in range(2)]
            v = bb.init(jax.random.PRNGKey(0), {"spatial_features": x[0], "batch_size": BATCH},
                        train=False)
            f = jax.jit(lambda a: bb.apply(v, {"spatial_features": a, "batch_size": BATCH},
                                           train=False)["spatial_features_2d"])
            timed(f, [(xi,) for xi in x], f"full backbone {tag}")


if __name__ == "__main__":
    main()
