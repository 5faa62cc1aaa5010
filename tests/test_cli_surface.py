"""CLI-surface features: repeat-eval polling, latest snapshot, infer_time."""
import sys
from pathlib import Path

import numpy as np
import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TestGetNoEvaluatedCkpt:
    def test_polling_order_and_record(self, tmp_path):
        from tools.test import get_no_evaluated_ckpt

        for e in (3, 1, 2):
            (tmp_path / f"checkpoint_epoch_{e}").mkdir()
        record = tmp_path / "eval_list_val.txt"
        record.write_text("1\n")
        epoch_id, ckpt = get_no_evaluated_ckpt(tmp_path, record, start_epoch=0)
        assert epoch_id == "2" and ckpt.name == "checkpoint_epoch_2"
        record.write_text("1\n2\n3\n")
        epoch_id, ckpt = get_no_evaluated_ckpt(tmp_path, record, start_epoch=0)
        assert epoch_id == -1 and ckpt is None

    def test_start_epoch_filter(self, tmp_path):
        from tools.test import get_no_evaluated_ckpt

        for e in (1, 2, 9):
            (tmp_path / f"checkpoint_epoch_{e}").mkdir()
        record = tmp_path / "r.txt"
        record.touch()
        epoch_id, _ = get_no_evaluated_ckpt(tmp_path, record, start_epoch=5)
        assert epoch_id == "9"


class TestLatestSnapshot:
    def test_saves_and_overwrites(self, tmp_path):
        import jax.numpy as jnp
        import optax
        from flax import linen as nn
        from pcp_tpu.train.checkpoint import save_latest_snapshot, load_checkpoint
        from pcp_tpu.train.train_state import create_train_state

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, batch, train=False):
                y = nn.Dense(2)(batch["x"])
                return {"loss": jnp.sum(y**2), "tb_dict": {}}

        model = Tiny()
        tx = optax.sgd(1e-2)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), {"x": jnp.ones((1, 3))})
        p1 = save_latest_snapshot(state, tmp_path, epoch=1, it=10)
        assert p1.name == "latest_model"
        payload = load_checkpoint(p1)
        assert int(payload["meta"]["epoch"]) == 1
        save_latest_snapshot(state, tmp_path, epoch=2, it=20)
        payload = load_checkpoint(tmp_path / "latest_model")
        assert int(payload["meta"]["epoch"]) == 2


class TestExchangeWriterFromCfg:
    def test_off_by_default_and_on_when_set(self, tmp_path):
        from pcp_tpu.config import CfgDict
        from pcp_tpu.utils.common_utils import create_logger
        from tools.test import _exchange_writer_from_cfg

        logger = create_logger()
        cfg_ = CfgDict({"MODEL": {"DENSE_HEAD": {"GENERATING_EXCHANGE_DATA": False}}})
        assert _exchange_writer_from_cfg(cfg_, logger) is None

        cfg_on = CfgDict({
            "MODEL": {
                "DENSE_HEAD": {
                    "GENERATING_EXCHANGE_DATA": True,
                    "DATABASE_EXCHANGE_DATA": str(tmp_path / "xdb"),
                }
            }
        })
        writer = _exchange_writer_from_cfg(cfg_on, logger)
        assert writer is not None
        assert (tmp_path / "xdb").exists()

    def test_missing_path_fails_loudly(self):
        from pcp_tpu.config import CfgDict
        from pcp_tpu.utils.common_utils import create_logger
        from tools.test import _exchange_writer_from_cfg

        cfg_bad = CfgDict({"MODEL": {"CORRECTOR": {"GENERATING_EXCHANGE_DATA": True}}})
        with pytest.raises(ValueError):
            _exchange_writer_from_cfg(cfg_bad, create_logger())
