"""MPPNet building blocks (flax).

Behavioral counterpart of
/root/reference/pcdet/models/model_utils/mppnet_utils.py: MLP, the PointNet
sequence-box encoder (:11-96), SpatialMixerBlock (:111-155, MLP-mixer over
the 3-D proxy grid), FFN (:377-403) and the grouped transformer
(:157-364) whose per-group learnable token summarizes each frame group via
token->proxy attention, with inter-group cross-attention on all but the last
encoder layer.

TPU re-design notes: everything is batch-first fixed-shape ((BG, S, C)
instead of torch's seq-first (S, BG, C)); the per-group stacking that torch
does by concatenating groups on the batch axis is an explicit reshape; the
encoder returns the per-layer group tokens (L, G, BR, C) for the reference's
deep-supervision losses.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """ReLU MLP, final layer linear (reference MLP :98-108)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"fc_{i}")(x))
        return nn.Dense(self.output_dim, name=f"fc_{self.num_layers - 1}")(x)


class _BN(nn.Module):
    """BatchNorm over the channel axis with torch-style defaults."""

    @nn.compact
    def __call__(self, x, train):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=not train,
                            axis_name=None)(x)


class PointNetFeat(nn.Module):
    """Per-point conv tower + max pool (reference PointNetfeat :11-36).
    x: (B, T, C_in) point/box sequence -> (B, out), (B, T, out)."""

    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train=False):
        widths = (64, 128, 256, self.out_channels)
        for i, w in enumerate(widths):
            x = nn.Dense(w, name=f"conv_{i}")(x)
            x = _BN(name=f"bn_{i}")(x, train)
            if i < len(widths) - 1:
                x = nn.relu(x)
        pooled = jnp.max(x, axis=1)
        return pooled, x


class SeqBoxPointNet(nn.Module):
    """The reference ``PointNet`` (:39-96): encodes the (8 x T) box-sequence,
    emitting a 7-DoF residual (centers+sizes+heading) and the joint feature."""

    channels: int

    @nn.compact
    def __call__(self, box_seq, train=False):
        """box_seq (B, T, 8) -> (box_reg (B, 7), feat (B, channels))."""
        x = _BN(name="pre_bn")(box_seq, train)
        pooled, _ = PointNetFeat(name="feat")(x, train)
        x = nn.relu(_BN(name="bn1")(nn.Dense(256, name="fc1")(pooled), train))
        feat = nn.relu(_BN(name="bn2")(nn.Dense(self.channels, name="fc2")(x), train))

        centers = nn.Dense(3, use_bias=False, name="fc_ce2")(
            nn.relu(nn.Dense(256, name="fc_ce1")(feat)))
        sizes = nn.Dense(3, use_bias=False, name="fc_s2")(
            nn.relu(nn.Dense(256, name="fc_s1")(feat)))
        headings = nn.Dense(1, use_bias=False, name="fc_hr2")(
            nn.relu(nn.Dense(256, name="fc_hr1")(feat)))
        return jnp.concatenate([centers, sizes, headings], axis=-1), feat


class FFN(nn.Module):
    """Residual feed-forward merge (reference FFN :377-403)."""

    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, tgt, tgt_input):
        x = nn.LayerNorm(name="norm2")(tgt + tgt_input)
        h = nn.Dense(self.d_model, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x)))
        return nn.LayerNorm(name="norm3")(x + h)


class SpatialMixerBlock(nn.Module):
    """MLP-mixer over the G^3 proxy grid (reference :111-155): mix along x,
    then y, then z, each with residual + LayerNorm, then a channel FFN."""

    hidden_dim: int
    grid_size: int
    channels: int

    @nn.compact
    def __call__(self, src):
        """src (B, G^3, C) -> (B, G^3, C)."""
        g, c = self.grid_size, self.channels
        b = src.shape[0]
        # reference: view(C, g, g, g).permute to put the mixed axis last
        x = src.reshape(b, g, g, g, c)  # (B, gx, gy, gz, C) with x slowest

        def mix(h, axis, name):
            moved = jnp.moveaxis(h, axis, -2)  # (..., g_mix, C) -> mix over g
            mixed = MLP(self.hidden_dim, g, 3, name=name)(
                jnp.swapaxes(moved, -1, -2))  # operate on the grid axis
            mixed = jnp.swapaxes(mixed, -1, -2)
            out = moved + mixed
            out = nn.LayerNorm(name=f"{name}_norm")(out)
            return jnp.moveaxis(out, -2, axis)

        x = mix(x, 1, "mixer_x")
        x = mix(x, 2, "mixer_y")
        x = mix(x, 3, "mixer_z")
        x = x.reshape(b, g * g * g, c)
        h = nn.Dense(2 * c, name="ffn_1")(x)
        h = nn.Dense(c, name="ffn_2")(nn.relu(h))
        return nn.LayerNorm(name="norm_channel")(x + h)


class MPPTransformerLayer(nn.Module):
    """One grouped encoder layer (reference TransformerEncoderLayer :266-364,
    forward_post): intra-group mixer + token attention + (inter-group
    cross-attention unless last layer)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    num_groups: int
    grid_size: int
    mixer_hidden: int
    is_last: bool

    @nn.compact
    def __call__(self, src, deterministic=True):
        """src (BR*G, 1+P, C); returns (same shape, tokens (G, BR, C))."""
        brg, s, c = src.shape
        g = self.num_groups
        br = brg // g
        token, proxies = src[:, :1], src[:, 1:]

        mixed = SpatialMixerBlock(self.mixer_hidden, self.grid_size, c,
                                  name="mlp_mixer_3d")(proxies)
        summary = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, name="self_attn")(token, mixed, mixed)
        token = nn.LayerNorm(name="norm1")(token + summary)
        h = nn.Dense(self.d_model, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(token)))
        token = nn.LayerNorm(name="norm2")(token + h)

        if not self.is_last:
            # inter-group fusion: each group cross-attends to the MLP-fused
            # concatenation of all groups (reference :322-341)
            p = mixed.shape[1]
            grouped = mixed.reshape(g, br, p, c)
            fused_in = jnp.concatenate([grouped[i] for i in range(g)], axis=-1)
            fused = MLP(self.d_model, self.d_model, 4, name="fusion_all_groups")(fused_in)
            outs = []
            for i in range(g):
                attn = nn.MultiHeadDotProductAttention(
                    num_heads=self.nhead, name=f"cross_attn_{i}")(grouped[i], fused, fused)
                outs.append(FFN(self.d_model, self.dim_feedforward,
                                name=f"ffn_{i}")(grouped[i], attn))
            mixed = jnp.concatenate(outs, axis=0)  # back to (BR*G, P, C)

        out = jnp.concatenate([token, mixed], axis=1)
        tokens = token.reshape(g, br, c)
        return out, tokens


class MPPTransformer(nn.Module):
    """Grouped encoder (reference Transformer :157-238 at num_frames<=4:
    one group per frame, learnable per-group token)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    num_groups: int
    num_proxy_points: int
    grid_size: int
    mixer_hidden: int

    @nn.compact
    def __call__(self, src, deterministic=True):
        """src (BR, G*P, C) -> (hs (G, BR, C), tokens (L, G, BR, C))."""
        br = src.shape[0]
        g, p, c = self.num_groups, self.num_proxy_points, self.d_model
        token = self.param("token", nn.initializers.zeros, (g, 1, c))

        groups = src.reshape(br, g, p, c).transpose(1, 0, 2, 3).reshape(g * br, p, c)
        tok = jnp.repeat(token, br, axis=0).reshape(g * br, 1, c)
        x = jnp.concatenate([tok, groups], axis=1)

        token_list = []
        for li in range(self.num_layers):
            x, tokens = MPPTransformerLayer(
                d_model=c, nhead=self.nhead, dim_feedforward=self.dim_feedforward,
                num_groups=g, grid_size=self.grid_size, mixer_hidden=self.mixer_hidden,
                is_last=(li == self.num_layers - 1), name=f"layer_{li}")(x, deterministic)
            token_list.append(tokens)
        hs = token_list[-1]  # (G, BR, C): final-layer group tokens
        return hs, jnp.stack(token_list, axis=0)
