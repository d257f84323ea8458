"""Single-stream fusion — ViLT-style joint transformer.

Counterpart of the reference's SingleStreamFusion
(src/modeling/fusion/fusion_approaches.py:516-677): modality-type
embeddings + a CLS token + one joint transformer encoder over the
concatenated [CLS; visual; text] sequence.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig
from vivqa_tpu.models.layers import (EncoderLayer, make_attention_mask, to_dtype)


class SingleStreamFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        v = nn.Dense(cfg.hidden_dim, dtype=dtype, name="v_proj")(visual["tokens"])
        t = nn.Dense(cfg.hidden_dim, dtype=dtype, name="q_proj")(text["tokens"])
        B = v.shape[0]
        t_mask = text.get("mask")
        if t_mask is None:
            t_mask = jnp.ones(t.shape[:2], jnp.int32)

        mod_embed = self.param("modality_embed", nn.initializers.normal(0.02),
                               (3, cfg.hidden_dim), jnp.float32)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_dim), jnp.float32)
        cls_tok = jnp.broadcast_to(cls, (B, 1, cfg.hidden_dim)).astype(dtype)
        cls_tok = cls_tok + mod_embed[0].astype(dtype)
        v = v + mod_embed[1].astype(dtype)
        t = t + mod_embed[2].astype(dtype)

        x = jnp.concatenate([cls_tok, v, t], axis=1)
        mask = jnp.concatenate([jnp.ones((B, 1 + v.shape[1]), jnp.int32), t_mask],
                               axis=1)
        attn = make_attention_mask(mask, mask)
        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg.num_heads, 4 * cfg.hidden_dim, cfg.dropout,
                             dtype, name=f"layers_{i}")(
                x, mask=attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dtype, name="ln")(x)
        return {"pooled": x[:, 0], "tokens": x, "mask": mask}
