import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.models import build_network
from test_model_forward import small_info

CFG_CAR = "tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_car.yaml"


def make_sweep_batch(rng, b=2, n=2048, ni=8, s=11):
    """Batch with pseudo-sweep structure: 7-feature points
    (x,y,z,i,t,sweep,inst) + instances_tf."""
    pts = np.zeros((b, n, 7), dtype=np.float32)
    pts[..., 0:2] = rng.uniform(-11, 11, size=(b, n, 2))
    pts[..., 2] = rng.uniform(-3, -0.5, size=(b, n))
    pts[..., 3] = rng.uniform(0, 1, size=(b, n))
    # half the points are foreground spread over instances/sweeps
    inst = rng.integers(-1, ni // 2, size=(b, n))
    sweep = np.where(inst >= 0, rng.integers(0, s, size=(b, n)), s - 1)
    pts[..., 5] = sweep
    pts[..., 6] = inst
    pts[..., 4] = 1.0 - sweep / (s - 1)
    mask = np.ones((b, n), dtype=bool)
    mask[:, -100:] = False

    tf = np.tile(np.eye(4, dtype=np.float32)[None, None, None], (b, ni, s, 1, 1))
    # some instances are moving: translation offsets grow with sweep age
    for i in range(0, ni // 2, 2):
        for k in range(s):
            tf[:, i, k, 0, 3] = 0.2 * (s - 1 - k)

    gt = np.zeros((b, 16, 8), dtype=np.float32)
    gt[:, : ni // 2, 0:2] = rng.uniform(-10, 10, size=(b, ni // 2, 2))
    gt[:, : ni // 2, 2] = -1.0
    gt[:, : ni // 2, 3:6] = [4.2, 1.8, 1.6]
    gt[:, : ni // 2, 7] = 1.0
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(mask),
        "gt_boxes": jnp.asarray(gt),
        "instances_tf": jnp.asarray(tf),
        "batch_size": b,
    }


@pytest.fixture(scope="module")
def car_cfg():
    cfg = CfgDict()
    cfg_from_yaml_file(CFG_CAR, cfg)
    return cfg


class TestHunterJr:
    def test_train_forward_with_corrector(self, car_cfg, rng):
        info = small_info(7)
        model = build_network(car_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_sweep_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
        assert np.isfinite(float(out["loss"]))
        tb = out["tb_dict"]
        for key in ["corrector_loss", "hm_loss_head_0"]:
            assert key in tb or key in out, key
        for key in ["l_points_cls", "l_fg_offset", "l_locals_transl", "l_locals_rot", "l_recon"]:
            assert np.isfinite(float(tb[key])), key

    def test_eval_exposes_scene_flow(self, car_cfg, rng):
        info = small_info(7)
        model = build_network(car_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_sweep_batch(rng, b=1, n=1024)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert out["points_cls_prob"].shape == (1, 1024, 3)
        assert out["points_flow3d"].shape == (1, 1024, 3)
        assert "final_box_dicts" in out

    def test_corrector_gradients(self, car_cfg, rng):
        info = small_info(7)
        model = build_network(car_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_sweep_batch(rng, b=1, n=1024)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return out["loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        # the object head must receive gradient
        flat = jax.tree_util.tree_leaves_with_path(grads)
        obj_grads = [
            float(jnp.sum(jnp.abs(leaf)))
            for path, leaf in flat
            if "object_head" in jax.tree_util.keystr(path)
        ]
        assert obj_grads and sum(obj_grads) > 0
        assert all(
            np.all(np.isfinite(np.asarray(leaf))) for _, leaf in flat
        )
