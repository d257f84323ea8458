"""Basic fusion strategies: concat / add / bilinear / cross-attention.

Counterpart of the reference's MultimodalFusion
(src/modeling/meta_arch/vqa_model.py:314-433 — the only four it actually
implements) and the bidirectional CrossAttentionFusion of the zoo
(src/modeling/fusion/fusion_approaches.py:59-281).

All fusion modules share one contract:
    __call__(visual: dict, text: dict, *, deterministic) -> dict with
        "pooled": (B, hidden_dim) fused vector
        "tokens": (B, L, hidden_dim) fused sequence (for generative use)
        "mask":   (B, L) validity mask for tokens
where `visual`/`text` are encoder output dicts (pooled/tokens[/mask]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig
from vivqa_tpu.models.layers import (CrossAttentionLayer, make_attention_mask,
                                     to_dtype)


def _full_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones(tokens.shape[:2], jnp.int32)


class ConcatFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["pooled"])
        q = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["pooled"])
        h = jnp.concatenate([v, q], axis=-1)
        h = nn.Dense(cfg.hidden_dim, dtype=dtype, name="out_proj")(h)
        h = nn.gelu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(h)
        tokens = jnp.stack([v, q], axis=1)
        return {"pooled": pooled, "tokens": tokens, "mask": _full_mask(tokens)}


class AddFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["pooled"])
        q = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["pooled"])
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(nn.gelu(v + q))
        tokens = jnp.stack([v, q], axis=1)
        return {"pooled": pooled, "tokens": tokens, "mask": _full_mask(tokens)}


class BilinearFusion(nn.Module):
    """Low-rank bilinear pooling: (W_v v) * (W_q q) with gated tanh,
    a static-shape MXU-friendly form of the reference's nn.Bilinear."""
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["pooled"])
        q = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["pooled"])
        h = jnp.tanh(v) * jnp.tanh(q)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(
            nn.Dense(cfg.hidden_dim, dtype=dtype, name="out_proj")(h))
        tokens = jnp.stack([v, q], axis=1)
        return {"pooled": pooled, "tokens": tokens, "mask": _full_mask(tokens)}


class CrossAttentionFusion(nn.Module):
    """Bidirectional co-attention (ViLBERT/LXMERT-style): image tokens
    attend to text and vice versa through N CrossAttentionLayers, then
    both streams are pooled and combined."""
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["tokens"])
        q = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["tokens"])
        t_mask = text.get("mask")
        v_mask = _full_mask(v)
        v2t = make_attention_mask(v_mask, t_mask)
        t2v = make_attention_mask(t_mask, v_mask)
        t2t = make_attention_mask(t_mask, t_mask)
        for i in range(cfg.num_layers):
            v_new = CrossAttentionLayer(cfg.num_heads, 4 * cfg.hidden_dim,
                                        cfg.dropout, dtype,
                                        name=f"v_layers_{i}")(
                v, q, cross_mask=v2t, deterministic=deterministic)
            q_new = CrossAttentionLayer(cfg.num_heads, 4 * cfg.hidden_dim,
                                        cfg.dropout, dtype,
                                        name=f"q_layers_{i}")(
                q, v, self_mask=t2t, cross_mask=t2v, deterministic=deterministic)
            v, q = v_new, q_new
        v_pooled = v.mean(axis=1)
        m = (t_mask[..., None].astype(q.dtype) if t_mask is not None
             else jnp.ones_like(q[..., :1]))
        q_pooled = (q * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(
            nn.Dense(cfg.hidden_dim, dtype=dtype, name="out_proj")(
                jnp.concatenate([v_pooled, q_pooled], axis=-1)))
        tokens = jnp.concatenate([v, q], axis=1)
        mask = jnp.concatenate(
            [v_mask, t_mask if t_mask is not None else _full_mask(q)], axis=1)
        return {"pooled": pooled, "tokens": tokens, "mask": mask}
