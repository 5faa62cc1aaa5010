"""BN recalibration: recovered running stats must equal the plain average of
per-batch statistics, for both BN flavours (flax decay-momentum BatchNorm and
torch-momentum MaskedBatchNorm), regardless of the momenta trained with."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.models.model_utils.norm import MaskedBatchNorm
from pcp_tpu.train.bn_recal import recalibrate_batch_stats


class TwoFlavourNet(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        x = batch["x"]
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn_flax")(x)
        z = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="bn_masked")(
            x, mask=batch["mask"], use_running_average=not train)
        return {"out": y + z}


def test_recal_matches_batch_average():
    rng = np.random.default_rng(0)
    batches = [
        {"x": jnp.asarray(rng.normal(3.0 * i, 1.0 + i, size=(16, 4)).astype(np.float32)),
         "mask": jnp.asarray(rng.uniform(size=16) > 0.3)}
        for i in range(5)
    ]
    model = TwoFlavourNet()
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=True)
    new_bs = recalibrate_batch_stats(
        model, variables["params"], variables["batch_stats"], list(batches),
        to_device=lambda b: b)

    # expected: plain average of per-batch stats
    exp_mean_flax = np.mean([np.mean(np.asarray(b["x"]), axis=0) for b in batches], axis=0)
    exp_var_flax = np.mean([np.var(np.asarray(b["x"]), axis=0) for b in batches], axis=0)
    np.testing.assert_allclose(np.asarray(new_bs["bn_flax"]["mean"]), exp_mean_flax, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_bs["bn_flax"]["var"]), exp_var_flax, rtol=1e-4)

    masked_means, masked_vars = [], []
    for b in batches:
        x, m = np.asarray(b["x"]), np.asarray(b["mask"])
        rows = x[m]
        masked_means.append(rows.mean(axis=0))
        masked_vars.append(rows.var(axis=0) * len(rows) / (len(rows) - 1))
    np.testing.assert_allclose(np.asarray(new_bs["bn_masked"]["mean"]),
                               np.mean(masked_means, axis=0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_bs["bn_masked"]["var"]),
                               np.mean(masked_vars, axis=0), rtol=1e-4)


def test_recal_preserves_untouched_leaves():
    """Stats leaves the train pass never updates keep their original values."""

    class GatedNet(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            x = nn.BatchNorm(use_running_average=not train, name="live")(batch["x"])
            # dead branch: stats exist but train pass keeps them unchanged
            frozen = nn.BatchNorm(use_running_average=True, name="dead")
            x = x + frozen(batch["x"])
            return {"out": x}

    rng = np.random.default_rng(1)
    batches = [{"x": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))} for _ in range(3)]
    model = GatedNet()
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=True)
    bs = jax.tree.map(lambda v: v + 0.5, variables["batch_stats"])  # make originals distinctive
    new_bs = recalibrate_batch_stats(model, variables["params"], bs, list(batches),
                                     to_device=lambda b: b)
    np.testing.assert_allclose(np.asarray(new_bs["dead"]["mean"]),
                               np.asarray(bs["dead"]["mean"]))
    np.testing.assert_allclose(np.asarray(new_bs["dead"]["var"]),
                               np.asarray(bs["dead"]["var"]))
    assert not np.allclose(np.asarray(new_bs["live"]["mean"]), np.asarray(bs["live"]["mean"]))
