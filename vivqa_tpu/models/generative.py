"""Generative VQA meta-architecture (encoder-decoder).

Counterpart of the reference's GenerativeVQAModel
(src/modeling/meta_arch/generative_vqa_model.py:479-703): CLIP-style
visual encoder + PhoBERT-style question encoder + cross-modal fusion
(concat token streams -> transformer -> optional MoE -> LN) + transformer
decoder with teacher forcing. Decoding lives in
vivqa_tpu/models/decoding.py (KV-cached greedy/top-k/top-p/beam — the
reference accepts `num_beams` but never implements beam search,
generative_vqa_model.py:607).

The model exposes three entry points so generation can jit the encoder
once and scan the decoder:
    __call__(...)    teacher-forcing logits (+ aux loss)
    encode(...)      fused encoder memory + mask
    decode_step(...) one cached decoder step (used under lax.scan)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import GenerativeVQAConfig
from vivqa_tpu.models.decoder import TransformerDecoder
from vivqa_tpu.models.encoders import create_text_encoder, create_visual_encoder
from vivqa_tpu.models.layers import EncoderLayer, make_attention_mask, to_dtype
from vivqa_tpu.models.moe.layer import create_moe_layer
from vivqa_tpu.models.vqa_model import moe_config_from_model


class CrossModalFusion(nn.Module):
    """Concat [visual; question] tokens -> N transformer layers ->
    optional MoE -> LayerNorm (reference generative_vqa_model.py:193-339)."""
    config: GenerativeVQAConfig

    @nn.compact
    def __call__(self, visual_tokens, question_tokens, question_mask=None,
                 expert_mask=None, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        v = nn.Dense(cfg.fusion_dim, dtype=dtype, name="v_proj")(visual_tokens)
        q = nn.Dense(cfg.fusion_dim, dtype=dtype, name="q_proj")(question_tokens)
        x = jnp.concatenate([v, q], axis=1)
        B = x.shape[0]
        v_mask = jnp.ones((B, v.shape[1]), jnp.int32)
        if question_mask is None:
            question_mask = jnp.ones((B, q.shape[1]), jnp.int32)
        mask = jnp.concatenate([v_mask, question_mask], axis=1)
        attn = make_attention_mask(mask, mask)

        for i in range(cfg.fusion_layers):
            x = EncoderLayer(cfg.fusion_heads, 4 * cfg.fusion_dim,
                             cfg.dropout, dtype, name=f"layers_{i}")(
                x, mask=attn, deterministic=deterministic)

        aux_loss = jnp.zeros((), jnp.float32)
        moe_metrics = {}
        if cfg.moe.use_moe and cfg.moe.moe_position in ("fusion", "both"):
            moe = create_moe_layer(
                moe_config_from_model(cfg, cfg.fusion_dim), name="moe")
            x, aux = moe(x, expert_mask, deterministic=deterministic)
            aux_loss = aux["aux_loss"]
            moe_metrics = aux["metrics"]
        x = nn.LayerNorm(dtype=dtype, name="ln_final")(x)
        return x, mask, aux_loss, moe_metrics


class GenerativeVQAModel(nn.Module):
    config: GenerativeVQAConfig

    def setup(self):
        cfg = self.config
        self.visual_encoder = create_visual_encoder(cfg.visual, name="visual_encoder")
        self.question_encoder = create_text_encoder(cfg.text, name="question_encoder")
        self.fusion = CrossModalFusion(cfg, name="fusion")
        self.decoder = TransformerDecoder(cfg, name="decoder")
        if cfg.knowledge.use_knowledge:
            # config-gated (static), so init/apply param trees agree
            self.knowledge_proj = nn.Dense(cfg.fusion_dim,
                                           dtype=to_dtype(cfg.dtype),
                                           name="knowledge_proj")
            self.knowledge_ln = nn.LayerNorm(dtype=to_dtype(cfg.dtype),
                                             name="knowledge_ln")

    def encode(self, pixel_values, question_ids, question_mask=None,
               expert_mask=None, knowledge_embeddings=None,
               knowledge_mask=None, *, deterministic: bool = True):
        visual = self.visual_encoder(pixel_values, deterministic=deterministic)
        text = self.question_encoder(question_ids, question_mask,
                                     deterministic=deterministic)
        fused, mask, aux_loss, moe_metrics = self.fusion(
            visual["tokens"], text["tokens"], text["mask"], expert_mask,
            deterministic=deterministic)
        if (self.config.knowledge.use_knowledge
                and knowledge_embeddings is not None):
            # retrieved contexts -> extra memory tokens (the decoder
            # cross-attends over them; fusion-in-decoder RAG). Replaces
            # the reference's pooled 0.5-residual per-sample loop
            # (vqa_model.py:689-702) with token-level access.
            k = self.knowledge_ln(self.knowledge_proj(
                knowledge_embeddings.astype(fused.dtype)))
            fused = jnp.concatenate([fused, k], axis=1)
            if knowledge_mask is None:
                knowledge_mask = jnp.ones(k.shape[:2], jnp.int32)
            mask = jnp.concatenate(
                [mask, knowledge_mask.astype(mask.dtype)], axis=1)
        return {"memory": fused, "memory_mask": mask,
                "aux_loss": aux_loss, "moe_metrics": moe_metrics}

    def decode_step(self, token_ids, memory, memory_mask):
        """One cached decoder step: token_ids (B, 1) -> logits (B, vocab)."""
        logits = self.decoder(token_ids, memory, memory_mask,
                              deterministic=True, decode=True)
        return logits[:, -1]

    def decode_step_full(self, token_ids, memory, memory_mask):
        """Full-length pass in decode mode — used once to SIZE the KV cache
        (flax creates cache variables shaped like the inputs); outputs are
        discarded."""
        return self.decoder(token_ids, memory, memory_mask,
                            deterministic=True, decode=True)

    def __call__(self, pixel_values, question_ids, decoder_input_ids,
                 question_mask=None, decoder_mask=None, expert_mask=None,
                 knowledge_embeddings=None, knowledge_mask=None, *,
                 deterministic: bool = True):
        enc = self.encode(pixel_values, question_ids, question_mask,
                          expert_mask, knowledge_embeddings, knowledge_mask,
                          deterministic=deterministic)
        logits, decoder_aux = self.decoder(
            decoder_input_ids, enc["memory"], enc["memory_mask"],
            decoder_mask, deterministic=deterministic, return_aux=True)
        return {"logits": logits,
                "aux_loss": enc["aux_loss"] + decoder_aux,
                "moe_metrics": enc["moe_metrics"]}


def create_generative_vqa_model(config: Optional[GenerativeVQAConfig] = None,
                                **overrides) -> GenerativeVQAModel:
    """Factory (reference create_generative_vqa_model,
    generative_vqa_model.py:706-824)."""
    config = config or GenerativeVQAConfig()
    if overrides:
        config = config.replace(**overrides)
    return GenerativeVQAModel(config)
