"""BatchNorm running-statistics recalibration (SWA-style ``update_bn``).

Small-dataset regimes (and fine-tuning with frozen subtrees) leave BN running
averages far from the true activation statistics: the EMA sees few, noisy
batches, so eval-mode normalization diverges wildly from the train-mode
behaviour the weights were optimized under. The torch ecosystem fixes this
with ``torch.optim.swa_utils.update_bn`` — recompute the running stats as a
plain average of per-batch statistics over the (train) loader.

This is the functional-JAX equivalent. The model mixes two BN flavours
(``flax.linen.BatchNorm`` with decay-style momentum, ``MaskedBatchNorm`` with
torch-style momentum), so instead of threading a momentum override through
every layer we recover each batch's statistics *algebraically*: every BN
update is affine in the stored value, ``new = r * old + (1 - r) * batch``
(r = flax momentum = 1 - torch momentum). In train mode the stored stats do
not affect the forward, so

  1. run one stats pass from an all-zeros tree and one from an all-ones tree
     on the same batch: the per-leaf difference IS ``r`` (identified once);
  2. per batch, a single pass from the zeros tree yields ``(1 - r) * batch``,
     i.e. ``batch = new / (1 - r)``;
  3. average the recovered per-batch stats across the loader.

Leaves that a train-mode apply never updates (r == 1, e.g. stats behind a
config-disabled branch) keep their original values.
"""
import jax
import jax.numpy as jnp


def recalibrate_batch_stats(model, params, batch_stats, loader, to_device,
                            max_batches=None, logger=None):
    """Return a new batch_stats tree holding dataset-average statistics.

    ``loader`` should iterate training batches (augmentation as trained);
    ``to_device`` maps a host batch dict to the device batch the model eats.
    """
    zeros = jax.tree.map(jnp.zeros_like, batch_stats)
    ones = jax.tree.map(jnp.ones_like, batch_stats)

    @jax.jit
    def stats_after(bs, batch):
        _, upd = model.apply(
            {"params": params, "batch_stats": bs}, batch,
            train=True, mutable=["batch_stats"],
            rngs={"sampling": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
        )
        return upd["batch_stats"]

    it = iter(loader)
    first = to_device(next(it))
    n0 = stats_after(zeros, first)
    n1 = stats_after(ones, first)
    rate = jax.tree.map(lambda a, b: b - a, n0, n1)  # coefficient on `old`
    # updated leaves have r strictly < 1; r == 1 means "never touched"
    live = jax.tree.map(lambda r: r < 1.0 - 1e-6, rate)

    @jax.jit
    def recover(new0):
        return jax.tree.map(
            lambda n, r, lv: jnp.where(lv, n / jnp.maximum(1.0 - r, 1e-6), 0.0),
            new0, rate, live,
        )

    acc = recover(n0)
    count = 1
    for batch in it:
        if max_batches is not None and count >= max_batches:
            break
        acc = jax.tree.map(jnp.add, acc, recover(stats_after(zeros, to_device(batch))))
        count += 1
    if logger is not None:
        logger.info(f"BN recalibration: averaged statistics over {count} batches")
    return jax.tree.map(
        lambda a, lv, orig: jnp.where(lv, a / count, orig),
        acc, live, batch_stats,
    )
