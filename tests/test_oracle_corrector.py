import numpy as np
import jax
import jax.numpy as jnp

from pcp_tpu.config import CfgDict
from pcp_tpu.datasets.v2x_sim.source import SyntheticV2XSource
from pcp_tpu.datasets.v2x_sim.v2x_sim_utils import get_pseudo_sweeps_of_1lidar, correction_numpy
from pcp_tpu.models.bev_layers.oracle_corrector import OracleCorrector
from test_model_forward import small_info


class TestOracleCorrector:
    def test_matches_correction_numpy(self):
        src = SyntheticV2XSource(num_scenes=1, keyframes_per_scene=4, num_cars=8, num_peds=2)
        token = src.lidar_token(src.scenes[0], 3, 1)
        stuff = get_pseudo_sweeps_of_1lidar(src, token, 10, ("car",), threshold_boxes_by_points=5)
        pts = stuff["points"]
        tf = stuff["instances_tf"]
        if tf.shape[0] == 0:
            import pytest

            pytest.skip("no instances in this synthetic frame")

        want = pts[:, :3].copy()
        fg = pts[:, -1] >= 0
        want[fg] = correction_numpy(pts[fg], tf)

        n_cap, ni_cap = 4096, 32
        batch_pts = np.zeros((1, n_cap, 7), np.float32)
        batch_pts[0, : pts.shape[0]] = pts[:n_cap]
        mask = np.zeros((1, n_cap), bool)
        mask[0, : pts.shape[0]] = True
        tf_pad = np.tile(np.eye(4, dtype=np.float32)[None, None, None], (1, ni_cap, 11, 1, 1))
        tf_pad[0, : tf.shape[0]] = tf

        oracle = OracleCorrector(model_cfg=CfgDict({}), info=small_info(7))
        out = oracle.apply(
            {},
            {
                "points": jnp.asarray(batch_pts),
                "points_mask": jnp.asarray(mask),
                "instances_tf": jnp.asarray(tf_pad),
                "batch_size": 1,
            },
        )
        got = np.asarray(out["points"])[0, : pts.shape[0], :3]
        np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-4, atol=1e-4)
