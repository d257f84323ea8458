"""Transformer decoder with KV-cached autoregressive decoding.

Counterpart of the reference's from-scratch TransformerDecoder
(src/modeling/meta_arch/generative_vqa_model.py:342-476): sinusoidal
positions, causal masking, tied output projection. The reference's
`generate()` re-runs the full decoder on the growing sequence each step
with NO KV cache (generative_vqa_model.py:656-701, O(L^2·layers) per
sample); here every self-attention layer carries a flax decode cache so a
decode step is O(L) — and the whole generation loop is a single compiled
`lax.scan`/`while_loop` (see vivqa_tpu/models/decoding.py).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import GenerativeVQAConfig
from vivqa_tpu.models.layers import (CrossAttentionLayer, make_attention_mask,
                                     sinusoidal_positions, to_dtype)
from vivqa_tpu.ops.embedding import MatmulGradEmbed


class TransformerDecoder(nn.Module):
    config: GenerativeVQAConfig

    @nn.compact
    def __call__(self, decoder_input_ids, encoder_hidden, encoder_mask=None,
                 decoder_mask=None, *, deterministic: bool = True,
                 decode: bool = False, return_aux: bool = False):
        """Teacher-forcing mode (decode=False): full (B, L) ids, causal mask.
        Incremental mode (decode=True): (B, 1) ids, cache holds the past.

        Returns logits (B, L, vocab) in float32.
        """
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        B, L = decoder_input_ids.shape

        embed = MatmulGradEmbed(cfg.vocab_size, cfg.decoder_dim,
                                embedding_init=nn.initializers.normal(0.02),
                                dtype=dtype, name="token_embed")
        x = embed(decoder_input_ids) * jnp.asarray(
            cfg.decoder_dim ** 0.5, dtype)

        pos_table = jnp.asarray(
            sinusoidal_positions(cfg.max_answer_length, cfg.decoder_dim))
        if decode:
            # Track the decode position with an explicit cache variable so
            # position embeddings stay correct one token at a time.
            is_init = not self.has_variable("cache", "pos_index")
            pos_index = self.variable("cache", "pos_index",
                                      lambda: jnp.zeros((), jnp.int32))
            idx = 0 if is_init else pos_index.value
            x = x + jnp.asarray(
                jnp.expand_dims(pos_table[idx], (0, 1)), dtype)
            if not is_init:
                pos_index.value = idx + 1
            self_mask = None  # flax cached attention masks internally
        else:
            x = x + pos_table[None, :L].astype(dtype)
            causal = nn.make_causal_mask(decoder_input_ids, dtype=jnp.bool_)
            if decoder_mask is not None:
                pad = make_attention_mask(decoder_mask, decoder_mask)
                self_mask = jnp.logical_and(causal, pad)
            else:
                self_mask = causal
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        cross_mask = make_attention_mask(
            jnp.ones((B, L), jnp.int32), encoder_mask) if encoder_mask is not None else None

        for i in range(cfg.decoder_layers):
            x = CrossAttentionLayer(
                cfg.decoder_heads, cfg.decoder_ff_dim, cfg.dropout, dtype,
                name=f"layers_{i}")(
                x, encoder_hidden.astype(dtype), self_mask=self_mask,
                cross_mask=cross_mask, deterministic=deterministic,
                decode=decode)

        moe_aux = jnp.zeros((), jnp.float32)
        if cfg.moe.use_moe and cfg.moe.moe_position in ("decoder", "both"):
            # moe_position='decoder' — declared but unimplemented in the
            # reference (SURVEY "declared-but-missing surface"). Dense MoE
            # is position-independent, so the same layer serves both
            # teacher forcing and single-token cached decode.
            from vivqa_tpu.models.moe.layer import create_moe_layer
            from vivqa_tpu.models.vqa_model import moe_config_from_model
            moe = create_moe_layer(
                moe_config_from_model(cfg, cfg.decoder_dim),
                name="decoder_moe")
            x, aux = moe(x, deterministic=deterministic)
            moe_aux = aux["aux_loss"]
        x = nn.LayerNorm(dtype=dtype, name="ln_final")(x)

        if cfg.tie_embeddings:
            logits = embed.attend(x.astype(jnp.float32))
        else:
            logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                              name="lm_head")(x)
        logits = logits.astype(jnp.float32)
        if return_aux:
            return logits, moe_aux
        return logits
