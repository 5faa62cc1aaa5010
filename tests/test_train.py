import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcp_tpu.config import CfgDict, cfg_from_yaml_file
from pcp_tpu.models import build_network
from pcp_tpu.train.optimization import build_optimizer, one_cycle_fns
from pcp_tpu.train.train_state import create_train_state, make_train_step
from pcp_tpu.parallel import make_mesh, shard_batch, replicate_state

from test_model_forward import small_info, make_batch, CFG_EGO


def ref_annealing_cos(start, end, pct):
    return end + (start - end) / 2.0 * (np.cos(np.pi * pct) + 1)


class TestOneCycle:
    def test_schedule_matches_reference_formula(self):
        total, lr_max, moms, div, pct = 1000, 3e-3, (0.95, 0.85), 10.0, 0.4
        lr_fn, mom_fn = one_cycle_fns(total, lr_max, moms, div, pct)
        a1 = int(total * pct)
        low = lr_max / div
        for step in [0, 1, 100, a1 - 1, a1, a1 + 1, 500, 999]:
            if step < a1:
                want_lr = ref_annealing_cos(low, lr_max, step / a1)
                want_mom = ref_annealing_cos(moms[0], moms[1], step / a1)
            else:
                want_lr = ref_annealing_cos(lr_max, low / 1e4, (step - a1) / (total - a1))
                want_mom = ref_annealing_cos(moms[1], moms[0], (step - a1) / (total - a1))
            # float32 schedule vs float64 reference: tolerance covers cos rounding
            assert float(lr_fn(step)) == pytest.approx(want_lr, rel=5e-4), step
            assert float(mom_fn(step)) == pytest.approx(want_mom, rel=5e-4), step

    def test_lr_peak_and_ends(self):
        lr_fn, _ = one_cycle_fns(100, 1e-3, (0.95, 0.85), 10.0, 0.4)
        assert float(lr_fn(0)) == pytest.approx(1e-4, rel=1e-5)
        assert float(lr_fn(40)) == pytest.approx(1e-3, rel=1e-5)
        assert float(lr_fn(99)) < 1e-6


@pytest.fixture(scope="module")
def ego_cfg():
    cfg = CfgDict()
    cfg_from_yaml_file(CFG_EGO, cfg)
    return cfg


class TestTrainStep:
    def test_overfit_single_batch(self, ego_cfg, rng):
        info = small_info(13)
        model = build_network(ego_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_batch(rng, b=1, n=512)
        tx, _ = build_optimizer(ego_cfg.OPTIMIZATION, total_iters_each_epoch=50, total_epochs=1)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step_fn = make_train_step(model, tx, donate=False)
        losses = []
        for _ in range(25):
            state, loss, tb = step_fn(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        # loss should drop substantially when overfitting one batch
        assert losses[-1] < losses[0] * 0.7, losses

    def test_multichip_data_parallel(self, ego_cfg, rng):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual cpu devices"
        mesh = make_mesh()
        info = small_info(13)
        model = build_network(ego_cfg.MODEL, num_class=1, dataset_info=info)
        batch = make_batch(rng, b=8, n=256)
        tx, _ = build_optimizer(ego_cfg.OPTIMIZATION, total_iters_each_epoch=10, total_epochs=1)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

        sharded = shard_batch(mesh, batch)
        state = replicate_state(mesh, state)
        step_fn = make_train_step(model, tx, donate=False)
        state2, loss, _ = step_fn(state, sharded)
        assert np.isfinite(float(loss))
        # params stay replicated
        leaf = jax.tree_util.tree_leaves(state2.params)[0]
        assert leaf.sharding.is_fully_replicated
