"""MoE experts.

Two families, matching the reference's zoo (src/modeling/moe/
expert_types.py:14-557) but re-designed for TPU dispatch:

1. **StackedExperts** — homogeneous feed-forward / GLU experts whose
   weights live in ONE stacked tensor (E, D, H). All experts compute in a
   single einsum (the expert axis rides the MXU batch dimension and is
   shardable over the 'model' mesh axis = expert parallelism). This
   replaces the reference's Python loop over expert modules
   (moe_layer.py:152-168), which is the reference's main MoE perf sin.

2. **Heterogeneous experts** — vision (spatial MHA), text (self-attn+FFN),
   multimodal (gated cross-attn); these have different architectures so
   they compute per-module on the full token sequence and are combined by
   router weights (dense VQA-MoE path).

Every expert maps (B, L, D) -> (B, L, D) with a residual inside.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.moe.config import ExpertConfig


class StackedExperts(nn.Module):
    """E homogeneous experts as stacked weights, computed in one shot.

    glu=False: expert_i(x) = LN(x + W2_i * act(W1_i x))
    glu=True:  expert_i(x) = LN(x + W2_i * (act(W1_i x) * (Wg_i x)))
    """
    num_experts: int
    hidden_dim: int
    glu: bool = False
    dropout: float = 0.0
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, L, D) -> per-expert outputs (B, L, E, D)."""
        D, E, H = x.shape[-1], self.num_experts, self.hidden_dim
        init = nn.initializers.lecun_normal()
        w_in = self.param("w_in", init, (E, D, H), jnp.float32)
        b_in = self.param("bias_in", nn.initializers.zeros, (E, H), jnp.float32)
        w_out = self.param("w_out", init, (E, H, D), jnp.float32)
        b_out = self.param("bias_out", nn.initializers.zeros, (E, D), jnp.float32)

        xc = x.astype(self.dtype)
        h = jnp.einsum("bld,edh->bleh", xc, w_in.astype(self.dtype))
        h = h + b_in.astype(self.dtype)
        h = nn.gelu(h)
        if self.glu:
            w_gate = self.param("w_gate", init, (E, D, H), jnp.float32)
            g = jnp.einsum("bld,edh->bleh", xc, w_gate.astype(self.dtype))
            h = h * nn.sigmoid(g)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        y = jnp.einsum("bleh,ehd->bled", h, w_out.astype(self.dtype))
        y = y + b_out.astype(self.dtype)
        # residual + per-expert LayerNorm (scale/bias shared across experts)
        y = y + xc[:, :, None, :]
        return nn.LayerNorm(dtype=self.dtype, name="ln")(y)


class FeedForwardExpert(nn.Module):
    """Single 2-layer MLP expert with residual+LN
    (reference expert_types.py:14-92)."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.config.dropout)(h, deterministic=deterministic)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(x + h)


class GatedLinearExpert(nn.Module):
    """GLU expert (reference expert_types.py:448-515)."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        up = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(x)
        gate = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="w_gate")(x)
        h = nn.gelu(up) * nn.sigmoid(gate)
        h = nn.Dropout(self.config.dropout)(h, deterministic=deterministic)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(x + h)


class VisionExpert(nn.Module):
    """Spatial multi-head attention over the token grid
    (reference expert_types.py:95-199)."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            dropout_rate=self.config.dropout, name="spatial_attn")(
            y, y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(y)
        y = nn.gelu(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(y)
        return x + y


class TextExpert(nn.Module):
    """Self-attention + FFN expert (reference expert_types.py:202-312)."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            dropout_rate=self.config.dropout, name="self_attn")(
            y, y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.config.dropout)(y, deterministic=deterministic)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(y)
        return x + y


class MultimodalExpert(nn.Module):
    """Cross-attention to the sequence mean + sigmoid modality gate
    (reference expert_types.py:315-445)."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        ctx = x.mean(axis=1, keepdims=True)
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            dropout_rate=self.config.dropout, name="cross_attn")(
            y, ctx, deterministic=deterministic)
        gate = nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype, name="gate")(x))
        x = x + gate * y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(y)
        y = nn.gelu(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(y)
        return x + y


_EXPERTS = {
    "feedforward": FeedForwardExpert,
    "glu": GatedLinearExpert,
    "vision": VisionExpert,
    "text": TextExpert,
    "multimodal": MultimodalExpert,
}


def create_expert(config: ExpertConfig, name: str) -> nn.Module:
    from vivqa_tpu.models.moe.specialized import SPECIALIZED_EXPERTS
    registry = {**_EXPERTS, **SPECIALIZED_EXPERTS}
    if config.expert_type not in registry:
        raise ValueError(f"unknown expert type '{config.expert_type}' "
                         f"(choices: {tuple(registry)})")
    return registry[config.expert_type](config, name=name)
