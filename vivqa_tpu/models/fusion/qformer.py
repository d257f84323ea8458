"""Q-Former fusion — BLIP-2-style learnable query tokens.

Counterpart of the reference's QFormerFusion
(src/modeling/fusion/fusion_approaches.py:284-513): N learnable queries
run through layers of self-attention + cross-attention to vision +
cross-attention to text; the query stream is mean-pooled into the fused
vector. Static query count = static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig
from vivqa_tpu.models.layers import (MlpBlock, make_attention_mask, to_dtype)


class QFormerLayer(nn.Module):
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, queries, vis, txt, txt_mask=None, *,
                 deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(queries)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, name="self_attn")(
            y, y, deterministic=deterministic)
        queries = queries + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln_v")(queries)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, name="cross_attn_vision")(
            y, vis, deterministic=deterministic)
        queries = queries + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln_t")(queries)
        q2t = make_attention_mask(jnp.ones(queries.shape[:2], jnp.int32), txt_mask)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, name="cross_attn_text")(
            y, txt, mask=q2t, deterministic=deterministic)
        queries = queries + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(queries)
        return queries + MlpBlock(self.d_ff, dropout=self.dropout,
                                  dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic)


class QFormerFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["tokens"])
        t = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["tokens"])
        t_mask = text.get("mask")
        B = v.shape[0]
        queries = self.param("query_tokens", nn.initializers.normal(0.02),
                             (1, cfg.num_query_tokens, cfg.hidden_dim), jnp.float32)
        x = jnp.broadcast_to(queries, (B,) + queries.shape[1:]).astype(dtype)
        for i in range(cfg.num_layers):
            x = QFormerLayer(cfg.num_heads, 4 * cfg.hidden_dim, cfg.dropout,
                             name=f"layers_{i}")(
                x, v, t, t_mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dtype, name="ln")(x)
        return {"pooled": x.mean(axis=1), "tokens": x,
                "mask": jnp.ones(x.shape[:2], jnp.int32)}
