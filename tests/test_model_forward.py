import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.models import build_network
from pcp_tpu.models.detectors.detector_template import DatasetInfo

CFG_EGO = "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml"


def small_info(num_feats, n_classes=1):
    # 12.8 m range -> 128x128 grid: keeps CPU compile time sane
    return DatasetInfo(
        class_names=tuple(["car", "truck"][:n_classes]),
        num_point_features=num_feats,
        point_cloud_range=(-12.8, -12.8, -8.0, 12.8, 12.8, 0.0),
        voxel_size=(0.2, 0.2, 8.0),
        grid_size=(128, 128, 1),
    )


def make_batch(rng, b=2, n=1024, m=8, num_feats=13):
    points = rng.uniform(-12.0, 12.0, size=(b, n, num_feats)).astype(np.float32)
    points[..., 2] = rng.uniform(-3.0, -0.5, size=(b, n))
    mask = np.ones((b, n), dtype=bool)
    mask[:, n - 50 :] = False  # padding tail
    gt = np.zeros((b, m, 8), dtype=np.float32)
    gt[:, :4, 0:2] = rng.uniform(-10, 10, size=(b, 4, 2))
    gt[:, :4, 2] = -1.0
    gt[:, :4, 3] = 4.2
    gt[:, :4, 4] = 1.8
    gt[:, :4, 5] = 1.6
    gt[:, :4, 6] = rng.uniform(-np.pi, np.pi, size=(b, 4))
    gt[:, :4, 7] = 1.0  # class car
    return {
        "points": jnp.asarray(points),
        "points_mask": jnp.asarray(mask),
        "gt_boxes": jnp.asarray(gt),
        "batch_size": b,
    }


@pytest.fixture(scope="module")
def ego_cfg():
    cfg = CfgDict()
    cfg_from_yaml_file(CFG_EGO, cfg)
    return cfg


class TestCenterPointForward:
    def test_eval_forward_shapes(self, ego_cfg, rng):
        info = small_info(13)
        model = build_network(ego_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        fbd = out["final_box_dicts"]
        post_max = int(ego_cfg.MODEL.DENSE_HEAD.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE)
        assert fbd["pred_boxes"].shape == (2, post_max, 7)
        assert fbd["pred_scores"].shape == (2, post_max)
        assert fbd["pred_labels"].shape == (2, post_max)
        assert fbd["pred_valid"].dtype == bool
        # labels 1-based where valid
        labels = np.asarray(fbd["pred_labels"])
        valid = np.asarray(fbd["pred_valid"])
        if valid.any():
            assert (labels[valid] >= 1).all()

    def test_train_forward_loss(self, ego_cfg, rng):
        info = small_info(13)
        model = build_network(ego_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        out, updates = model.apply(
            variables, batch, train=True, mutable=["batch_stats"]
        )
        loss = np.asarray(out["loss"])
        assert np.isfinite(loss)
        assert loss > 0
        assert "hm_loss_head_0" in out["tb_dict"]
        # batch stats updated
        assert "batch_stats" in updates

    def test_gradients_flow(self, ego_cfg, rng):
        info = small_info(13)
        model = build_network(ego_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_batch(rng, b=1, n=512)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return out["loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0


class TestBF16Mode:
    def test_bf16_outputs_close_to_f32(self, rng):
        """MODEL.BF16 runs backbone+head convs in bfloat16; predictions must
        stay close to f32 (same params)."""
        import jax
        import jax.numpy as jnp
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network

        cfg = CfgDict()
        cfg_from_yaml_file(CFG_EGO, cfg)
        info = small_info(13)
        batch = make_batch(rng, b=1, n=512)

        model32 = build_network(cfg.MODEL, num_class=1, dataset_info=info)
        v = model32.init(jax.random.PRNGKey(0), batch, train=False)
        out32 = model32.apply(v, batch, train=False)

        import copy
        cfg_bf = CfgDict()
        cfg_from_yaml_file(CFG_EGO, cfg_bf)
        cfg_bf.MODEL["BF16"] = True
        model_bf = build_network(cfg_bf.MODEL, num_class=1, dataset_info=info)
        out_bf = model_bf.apply(v, batch, train=False)

        hm32 = np.asarray(out32["head_preds"][0]["hm"])
        hmbf = np.asarray(out_bf["head_preds"][0]["hm"])
        assert hmbf.dtype == np.float32
        # bf16 has ~3 decimal digits; logits should agree to ~1e-1 absolute
        assert np.abs(hm32 - hmbf).max() < 0.2
        assert np.abs(hm32 - hmbf).mean() < 0.02
