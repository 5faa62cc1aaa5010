"""Differential tests of the torch->jax weight converter: build small torch
reference layers, convert, and require numerical agreement with the flax
modules in eval mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from pcp_tpu.utils.torch_converter import _t_conv, _t_deconv, _t_linear


class TestLayerConversions:
    def test_conv2d(self, rng):
        tconv = tnn.Conv2d(8, 16, 3, padding=1, bias=True)
        x = rng.normal(0, 1, (2, 8, 10, 10)).astype(np.float32)
        with torch.no_grad():
            want = tconv(torch.from_numpy(x)).numpy()

        import flax.linen as nn

        fconv = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))
        variables = {
            "params": {
                "kernel": jnp.asarray(_t_conv(tconv.weight.detach().numpy())),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
        got = np.asarray(fconv.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("k", [2, 1])
    def test_conv_transpose2d(self, rng, k):
        tconv = tnn.ConvTranspose2d(6, 12, k, stride=k, bias=False)
        x = rng.normal(0, 1, (1, 6, 7, 7)).astype(np.float32)
        with torch.no_grad():
            want = tconv(torch.from_numpy(x)).numpy()

        import flax.linen as nn

        fconv = nn.ConvTranspose(12, (k, k), strides=(k, k), padding="VALID", use_bias=False)
        variables = {"params": {"kernel": jnp.asarray(_t_deconv(tconv.weight.detach().numpy()))}}
        got = np.asarray(fconv.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5)

    def test_linear_bn_relu_stack(self, rng):
        lin = tnn.Linear(10, 6, bias=False)
        bn = tnn.BatchNorm1d(6, eps=1e-3, momentum=0.01)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.eval()
        x = rng.normal(0, 1, (32, 10)).astype(np.float32)
        with torch.no_grad():
            want = torch.relu(bn(lin(torch.from_numpy(x)))).numpy()

        from pcp_tpu.models.model_utils.norm import MaskedBatchNorm
        import flax.linen as nn

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(6, use_bias=False, name="linear")(x)
                x = MaskedBatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
                    x, use_running_average=True
                )
                return nn.relu(x)

        variables = {
            "params": {
                "linear": {"kernel": jnp.asarray(_t_linear(lin.weight.detach().numpy()))},
                "norm": {
                    "scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "norm": {
                    "mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy()),
                }
            },
        }
        got = np.asarray(Stack().apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestFullModelConversion:
    def test_pillar_centerpoint_roundtrip_structure(self, rng):
        """Converted tree must slot into build_network's variable structure."""
        from pcp_tpu.config import CfgDict, cfg_from_yaml_file
        from pcp_tpu.models import build_network
        from pcp_tpu.utils.torch_converter import convert_centerpoint_state_dict
        from test_model_forward import small_info, make_batch

        cfg = CfgDict()
        cfg_from_yaml_file("tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_ego.yaml", cfg)
        model = build_network(cfg.MODEL, 1, small_info(13))
        batch = make_batch(np.random.default_rng(0), b=1, n=256)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        # build a torch-style state dict with random values shaped like pcdet's
        sd = {}
        f_in = 17  # 11 raw + cluster3 + center3
        sd["vfe.pfn_layers.0.linear.weight"] = rng.normal(0, 0.1, (32, f_in)).astype(np.float32)
        for stat, shape in [("weight", 32), ("bias", 32), ("running_mean", 32), ("running_var", 32)]:
            sd[f"vfe.pfn_layers.0.norm.{stat}"] = np.abs(rng.normal(0, 1, shape)).astype(np.float32)
        sd["vfe.pfn_layers.1.linear.weight"] = rng.normal(0, 0.1, (64, 64)).astype(np.float32)
        for stat in ["weight", "bias", "running_mean", "running_var"]:
            sd[f"vfe.pfn_layers.1.norm.{stat}"] = np.abs(rng.normal(0, 1, 64)).astype(np.float32)

        converted = convert_centerpoint_state_dict(sd, cfg.MODEL)
        # merge into the inited tree and check structural agreement for the vfe
        got_keys = set(converted["params"]["vfe"].keys())
        want_keys = set(variables["params"]["vfe"].keys())
        assert got_keys == want_keys
        for pfn in got_keys:
            assert (
                converted["params"]["vfe"][pfn]["linear"]["kernel"].shape
                == variables["params"]["vfe"][pfn]["linear"]["kernel"].shape
            )
