"""MCAN — Deep Modular Co-Attention Network fusion.

The reference *declares* MCAN (enum string, vqa_config.py:35) but never
implements it; this is a real implementation of Yu et al. 2019:
an encoder of self-attention units over question tokens, a decoder of
(self-attention + question-guided-attention) units over image tokens,
followed by attentional flattening of both streams.

Everything is dense matmul + softmax — pure MXU work under XLA fusion.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig
from vivqa_tpu.models.layers import (CrossAttentionLayer, EncoderLayer,
                                     make_attention_mask, to_dtype)


class AttFlat(nn.Module):
    """Attentional flattening: MLP -> masked softmax over tokens ->
    weighted sum, with g glimpses."""
    hidden_dim: int
    glimpses: int = 1
    mlp_dim: int = 512
    dropout: float = 0.1
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        att = nn.Dense(self.mlp_dim, dtype=self.dtype, name="att_fc1")(x)
        att = nn.gelu(att)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        att = nn.Dense(self.glimpses, dtype=self.dtype, name="att_fc2")(att)
        if mask is not None:
            att = jnp.where(mask[..., None] > 0, att, -1e9)
        att = nn.softmax(att.astype(jnp.float32), axis=1).astype(x.dtype)
        flat = jnp.einsum("blg,bld->bgd", att, x).reshape(x.shape[0], -1)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="merge")(flat)


class MCANFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["tokens"])
        q = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["tokens"])
        t_mask = text.get("mask")
        qq = make_attention_mask(t_mask, t_mask)
        v2q = make_attention_mask(jnp.ones(v.shape[:2], jnp.int32), t_mask)

        # Encoder: self-attention over the question
        for i in range(cfg.num_layers):
            q = EncoderLayer(cfg.num_heads, 4 * cfg.hidden_dim, cfg.dropout,
                             dtype, name=f"enc_{i}")(
                q, mask=qq, deterministic=deterministic)
        # Decoder: image self-attention + question-guided attention
        for i in range(cfg.num_layers):
            v = CrossAttentionLayer(cfg.num_heads, 4 * cfg.hidden_dim,
                                    cfg.dropout, dtype, name=f"dec_{i}")(
                v, q, cross_mask=v2q, deterministic=deterministic)

        q_flat = AttFlat(cfg.hidden_dim, cfg.mcan_flat_glimpses,
                         cfg.mcan_flat_mlp_dim, cfg.dropout,
                         name="q_flat")(q, t_mask, deterministic=deterministic)
        v_flat = AttFlat(cfg.hidden_dim, cfg.mcan_flat_glimpses,
                         cfg.mcan_flat_mlp_dim, cfg.dropout,
                         name="v_flat")(v, None, deterministic=deterministic)
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(q_flat + v_flat)
        tokens = jnp.concatenate([v, q], axis=1)
        v_mask = jnp.ones(v.shape[:2], jnp.int32)
        mask = jnp.concatenate(
            [v_mask, t_mask if t_mask is not None else jnp.ones(q.shape[:2], jnp.int32)],
            axis=1)
        return {"pooled": pooled, "tokens": tokens, "mask": mask}
