"""BERT-family text encoder (flax).

One architecture covers PhoBERT / BERT / RoBERTa / BARTpho-encoder /
CLIP-text — they differ only in vocab, depth/width and pooling
(reference TextEncoder wrapper over HF AutoModel,
src/modeling/meta_arch/vqa_model.py:134-234; standalone zoo in
src/modeling/heads/text_representation.py).

Static shapes: inputs are always padded to ``config.max_length``; the
attention mask rides along as a (B, L) int array.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import TextEncoderConfig
from vivqa_tpu.models.layers import (EncoderLayer, make_attention_mask,
                                     pool_sequence, to_dtype)
from vivqa_tpu.ops.embedding import MatmulGradEmbed


class TextEncoder(nn.Module):
    config: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask=None, *,
                 deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        # token embedding uses the matmul-gradient lookup: the scatter
        # backward is slow under the SPMD partitioner (vivqa_tpu/ops/
        # embedding.py); param layout is identical to nn.Embed
        tok = MatmulGradEmbed(cfg.vocab_size, cfg.hidden_dim,
                              embedding_init=nn.initializers.normal(0.02),
                              dtype=dtype, name="token_embed")(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None]
        pos = nn.Embed(cfg.max_length, cfg.hidden_dim,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=dtype, name="pos_embed")(pos_ids)
        x = tok + pos
        if cfg.type_vocab_size > 1:
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_dim, dtype=dtype,
                             name="type_embed")(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(dtype=dtype, name="ln_embed")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        attn_mask = make_attention_mask(attention_mask, attention_mask)
        for i in range(cfg.num_layers):
            x = EncoderLayer(num_heads=cfg.num_heads,
                             d_ff=int(cfg.hidden_dim * cfg.mlp_ratio),
                             dropout=cfg.dropout, dtype=dtype,
                             norm_style=cfg.norm_style,
                             activation=cfg.activation,
                             name=f"layers_{i}")(x, mask=attn_mask,
                                                 deterministic=deterministic)
        if cfg.norm_style == "pre":
            # post-LN (BERT family) has no final LayerNorm — keeping the
            # layouts distinct preserves HF weight-import parity
            x = nn.LayerNorm(dtype=dtype, name="ln_final")(x)

        pooled = pool_sequence(x, attention_mask, cfg.pooling)
        if cfg.output_dim:
            proj = nn.Dense(cfg.output_dim, use_bias=False, dtype=dtype,
                            name="projection")
            pooled, x = proj(pooled), proj(x)
        return {"pooled": pooled, "tokens": x, "mask": attention_mask}
