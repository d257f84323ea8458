"""Classification VQA meta-architecture.

Counterpart of the reference's VietnameseVQAModel
(src/modeling/meta_arch/vqa_model.py:480-727): visual encoder + text
encoder + fusion + optional MoE + optional knowledge/RAG + answer head.

TPU re-design notes:
- forward is a pure function of (params, batch, rngs); loss lives in
  vivqa_tpu/train/losses.py, not inside the model;
- the RAG residual is a *batched* context attention over retrieved
  knowledge embeddings, replacing the reference's per-sample Python loop
  (vqa_model.py:689-702);
- MoE is applied to the fused token sequence when the fusion provides one
  (richer than the reference's pooled-vector unsqueeze(1), vqa_model.py:
  670-686); the pooled vector is re-derived by masked mean afterwards.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vivqa_tpu.models.config import VQAModelConfig
from vivqa_tpu.models.encoders import create_text_encoder, create_visual_encoder
from vivqa_tpu.models.fusion import create_fusion
from vivqa_tpu.models.heads import AnswerHead
from vivqa_tpu.models.layers import to_dtype
from vivqa_tpu.models.moe.config import MoEConfig, ExpertConfig, RouterConfig, VQAMoEConfig
from vivqa_tpu.models.moe.layer import create_moe_layer


def moe_config_from_model(cfg: VQAModelConfig | "object", input_dim: int):
    """Translate the meta-arch MoE knobs into a full MoE subsystem config."""
    m = cfg.moe
    router = RouterConfig(router_type=m.router_type, top_k=m.top_k,
                          capacity_factor=m.capacity_factor,
                          load_balance_weight=m.load_balance_weight,
                          z_loss_weight=m.router_z_weight)
    if m.moe_type == "vqa":
        return VQAMoEConfig(
            input_dim=input_dim,
            num_vision_experts=m.num_vision_experts,
            num_text_experts=m.num_text_experts,
            num_multimodal_experts=m.num_multimodal_experts,
            specialized_types=("object_detection", "counting",
                               "scene_understanding", "ocr",
                               "segmentation", "spatial_reasoning")[: m.num_specialized_experts],
            expert_hidden_dim=m.expert_hidden_dim,
            # honour m.router_type (router-swap ablations flow through
            # here); "topk" — the generic default — upgrades to the
            # VQA-MoE noisy default (reference generative_vqa_model.py:62)
            router=(router.replace(router_type="noisy_topk")
                    if m.router_type == "topk" else router))
    return MoEConfig(num_experts=m.num_experts, input_dim=input_dim,
                     expert=ExpertConfig(hidden_dim=m.expert_hidden_dim),
                     router=router, moe_type=m.moe_type)


class KnowledgeAttention(nn.Module):
    """Batched RAG fusion: the fused vector attends over retrieved
    knowledge embeddings; residual add with a fixed weight
    (reference: fused + 0.5*knowledge per-sample loop, vqa_model.py:689-702;
    ContextAttention rag_module.py:80-166)."""
    hidden_dim: int
    residual_weight: float = 0.5
    num_heads: int = 8
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fused, knowledge, knowledge_mask=None, *,
                 deterministic: bool = True):
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_proj")(knowledge)
        q = fused[:, None, :]
        mask = None
        if knowledge_mask is not None:
            mask = nn.make_attention_mask(
                jnp.ones((fused.shape[0], 1), jnp.int32), knowledge_mask,
                dtype=jnp.bool_)
        ctx = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="context_attn")(
            q, k, mask=mask, deterministic=deterministic)[:, 0]
        return fused + self.residual_weight * ctx


class VietnameseVQAModel(nn.Module):
    config: VQAModelConfig

    @nn.compact
    def __call__(self, pixel_values, input_ids, attention_mask=None,
                 knowledge_embeddings: Optional[jnp.ndarray] = None,
                 knowledge_mask: Optional[jnp.ndarray] = None,
                 expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)

        visual = create_visual_encoder(cfg.visual)(
            pixel_values, deterministic=deterministic)
        if cfg.visual.freeze:
            visual = jax.tree.map(jax.lax.stop_gradient, visual)
        text = create_text_encoder(cfg.text)(
            input_ids, attention_mask, deterministic=deterministic)
        if cfg.text.freeze:
            text = jax.tree.map(jax.lax.stop_gradient, text)

        fused = create_fusion(cfg.fusion)(visual, text, deterministic=deterministic)
        pooled, tokens, mask = fused["pooled"], fused["tokens"], fused["mask"]

        aux_loss = jnp.zeros((), jnp.float32)
        moe_metrics = {}
        if cfg.moe.use_moe:
            moe = create_moe_layer(
                moe_config_from_model(cfg, cfg.fusion.hidden_dim), name="moe")
            tokens, aux = moe(tokens, expert_mask, deterministic=deterministic)
            aux_loss = aux_loss + aux["aux_loss"]
            moe_metrics = aux["metrics"]
            m = mask[..., None].astype(tokens.dtype)
            pooled = pooled + (tokens * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)

        if cfg.knowledge.use_knowledge and knowledge_embeddings is not None:
            pooled = KnowledgeAttention(
                cfg.fusion.hidden_dim, cfg.knowledge.residual_weight,
                name="knowledge_attn")(
                pooled, knowledge_embeddings.astype(dtype), knowledge_mask,
                deterministic=deterministic)

        logits = AnswerHead(cfg.head, cfg.num_answers, name="answer_head")(
            pooled, deterministic=deterministic)
        return {"logits": logits, "features": pooled,
                "aux_loss": aux_loss, "moe_metrics": moe_metrics}


def create_vqa_model(config: VQAModelConfig | None = None, **overrides) -> VietnameseVQAModel:
    """Factory with kwargs-override of the default config
    (reference create_vqa_model, vqa_model.py:730)."""
    config = config or VQAModelConfig()
    if overrides:
        config = config.replace(**overrides)
    return VietnameseVQAModel(config)
