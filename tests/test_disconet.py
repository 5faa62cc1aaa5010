import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.datasets import build_dataloader
from pcp_tpu.models import build_network
from pcp_tpu.models.bev_layers.v2x_fusion_disco import transform_bev_img
from pcp_tpu.train.optimization import build_optimizer
from pcp_tpu.train.train_state import create_train_state, make_train_step
from pcp_tpu.train.train_utils import _to_device_batch
from pcp_tpu.utils.common_utils import create_logger
from test_model_forward import small_info

CFG_DISCO = "tools/cfgs/v2x_sim_models/v2x_pointpillar_disco.yaml"


@pytest.fixture(scope="module")
def disco_cfg():
    cfg = CfgDict()
    cfg_from_yaml_file(CFG_DISCO, cfg)
    cfg.DATA_CONFIG.update({"USE_SYNTHETIC_DATA": True, "MAX_POINTS_PER_SAMPLE": 8192})
    cfg.DATA_CONFIG["SYNTHETIC"] = {"NUM_SCENES": 3, "KEYFRAMES_PER_SCENE": 3,
                                    "NUM_CARS": 8, "NUM_PEDS": 2}
    return cfg


class TestBEVWarp:
    def test_identity_transform_is_noop(self, rng):
        img = jnp.asarray(rng.normal(0, 1, (32, 32, 4)).astype(np.float32))
        out = transform_bev_img(jnp.eye(4), img, -12.8, 0.8)
        assert np.allclose(np.asarray(out), np.asarray(img))

    def test_pure_translation_shifts_pixels(self, rng):
        img = np.zeros((32, 32, 1), dtype=np.float32)
        img[10, 12, 0] = 1.0
        # dst_se3_src translation of +2 pixels in x (pix 0.8 m)
        tf = np.eye(4)
        tf[0, 3] = 2 * 0.8
        # window must be centered on the frame origin: pc_min = -(H*pix)/2
        out = np.asarray(transform_bev_img(jnp.asarray(tf), jnp.asarray(img), -12.8, 0.8))
        ys, xs, _ = np.nonzero(out > 0.5)
        assert (ys[0], xs[0]) == (10, 14)

    def test_rotation_90deg(self, rng):
        img = np.zeros((33, 33, 1), dtype=np.float32)
        img[16, 24, 0] = 1.0  # +x direction from center
        c, s = 0.0, 1.0
        tf = np.eye(4)
        tf[:2, :2] = [[c, -s], [s, c]]  # dst_se3_src = rot90
        pc_min, pix = -13.2, 0.8  # center of 33-px image at 0 metric
        out = np.asarray(transform_bev_img(jnp.asarray(tf), jnp.asarray(img), pc_min, pix))
        ys, xs, _ = np.nonzero(out > 0.5)
        # point on +x axis maps to +y axis under rot90
        assert len(ys) >= 1
        assert abs(int(xs[0]) - 16) <= 1 and int(ys[0]) > 20


class TestDiscoNet:
    def test_dataset_has_agent_channel_and_poses(self, disco_cfg):
        ds, loader, _ = build_dataloader(
            disco_cfg.DATA_CONFIG, disco_cfg.CLASS_NAMES, batch_size=2, training=False,
            logger=create_logger(), workers=0,
        )
        batch = next(iter(loader))
        assert batch["points"].shape[2] == 6  # x,y,z,i,t,agent_idx
        assert batch["se3_from_ego_arr"].shape == (2, 6, 4, 4)
        assert batch["agent_present"].shape == (2, 6)
        agents = np.unique(batch["points"][batch["points_mask"]][:, -1]).astype(int)
        assert 1 in agents and len(agents) >= 2  # ego + others

    def test_train_step_and_frozen_makers(self, disco_cfg):
        ds, loader, _ = build_dataloader(
            disco_cfg.DATA_CONFIG, disco_cfg.CLASS_NAMES, batch_size=2, training=True,
            logger=create_logger(), workers=0,
        )
        batch = _to_device_batch(next(iter(loader)))
        model = build_network(disco_cfg.MODEL, num_class=1, dataset_info=small_info(6))
        tx, _ = build_optimizer(disco_cfg.OPTIMIZATION, 10, 1)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        params_before = jax.device_get(state.params)
        step = make_train_step(model, tx, donate=False)
        state2, loss, tb = step(state, batch)
        assert np.isfinite(float(loss))
        assert "distill_loss" in tb

        # frozen BEVMaker params unchanged; trainable params changed
        pb = params_before
        pa = jax.device_get(state2.params)
        for maker in ("bev_maker_rsu", "bev_maker_car", "bev_maker_early"):
            b_leaves = jax.tree_util.tree_leaves(pb[maker])
            a_leaves = jax.tree_util.tree_leaves(pa[maker])
            assert all(np.array_equal(x, y) for x, y in zip(b_leaves, a_leaves)), maker
        diff = sum(
            float(np.abs(np.asarray(x) - np.asarray(y)).sum())
            for x, y in zip(
                jax.tree_util.tree_leaves(pb["v2x_mid_fusion"]),
                jax.tree_util.tree_leaves(pa["v2x_mid_fusion"]),
            )
        )
        assert diff > 0


class TestAsyncTrainingSignal:
    def test_exchange_previous_displaces_training_signal(self):
        """The mechanism behind the round-3 inverted disco sync row: with
        EXCHANGE_PREVIOUS, a moving object seen ONLY by other agents appears
        in the input at its t-1 position while gt_boxes supervise its t
        position — the training signal demands a systematic +v*dt lead on
        exchanged content. A net trained this way, evaluated on FRESH (sync)
        exchange, overshoots moving objects by ~v*dt; matched-training per
        latency column removes the mismatch (synth_experiments.sh)."""
        cfg = CfgDict()
        cfg_from_yaml_file(CFG_DISCO, cfg)
        cfg.DATA_CONFIG.update({
            "USE_SYNTHETIC_DATA": True, "MAX_POINTS_PER_SAMPLE": 16384,
            "MINI_TRAINVAL_STRIDE": 1, "DATASET_DOWNSAMPLING_RATIO": 1,
            "SYNTHETIC": {"NUM_SCENES": 3, "KEYFRAMES_PER_SCENE": 4,
                          "NUM_CARS": 10, "NUM_PEDS": 0, "WORLD": "urban"},
        })
        # aug off so point/GT geometry is directly comparable
        cfg.DATA_CONFIG.DATA_AUGMENTOR.DISABLE_AUG_LIST = [
            c["NAME"] for c in cfg.DATA_CONFIG.DATA_AUGMENTOR.AUG_CONFIG_LIST]

        def mean_offset(exchange_previous):
            cfg.DATA_CONFIG["EXCHANGE_PREVIOUS"] = exchange_previous
            ds, _, _ = build_dataloader(
                cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True,
                logger=create_logger(), workers=0)
            offs = []
            for idx in range(len(ds)):
                d = ds[idx]
                pts, gt = d["points"], d["gt_boxes"]
                exch = pts[pts[:, -1] != 1]  # non-ego agent points
                for b in gt:
                    rel = exch[:, :2] - b[:2]
                    near = np.linalg.norm(rel, axis=1) < 3.0
                    if near.sum() >= 5:
                        # offset of the exchanged point cluster from the
                        # CURRENT-time gt center
                        offs.append(np.linalg.norm(exch[near, :2].mean(0) - b[:2]))
            return np.mean(offs), len(offs)

        off_async, n_a = mean_offset(True)
        off_sync, n_s = mean_offset(False)
        assert n_a >= 5 and n_s >= 5, f"too few exchanged clusters ({n_a}, {n_s})"
        # async training data carries a systematically larger exchanged-cluster
        # offset from current-time GT than sync data
        assert off_async > off_sync + 0.1, (
            f"expected stale-exchange displacement: async {off_async:.2f} "
            f"vs sync {off_sync:.2f}")
