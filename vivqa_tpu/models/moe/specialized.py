"""Specialized VQA experts.

Counterpart of the reference's six specialized experts
(src/modeling/moe/specialized_experts.py:15-897): segmentation (SAM-
inspired mask tokens), object detection (DETR-style object queries), OCR
(reading-order attention + diacritic head), scene understanding (scene
tokens + global context), spatial reasoning (pairwise relations), and
counting (count queries + density head).

Re-designed for TPU: all are static-shape token->token maps (B, L, D) ->
(B, L, D); the O(L^2) pairwise module of SpatialReasoningExpert is a
single batched einsum rather than a Python pair loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.moe.config import ExpertConfig


class _QueryDecoderExpert(nn.Module):
    """Shared skeleton: K learnable queries cross-attend to tokens, then
    tokens cross-attend back to the refined queries."""
    config: ExpertConfig
    num_queries: int = 16
    dtype = jnp.bfloat16

    def head(self, q):
        """Optional per-expert transform of refined queries."""
        return q

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B = x.shape[0]
        queries = self.param("queries", nn.initializers.normal(0.02),
                             (1, self.num_queries, x.shape[-1]), jnp.float32)
        q = jnp.broadcast_to(queries, (B,) + queries.shape[1:]).astype(self.dtype)
        q = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            name="query_attn")(q, nn.LayerNorm(dtype=self.dtype, name="ln_q")(x),
                               deterministic=deterministic)
        q = self.head(q)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            name="token_attn")(nn.LayerNorm(dtype=self.dtype, name="ln_t")(x), q,
                               deterministic=deterministic)
        x = x + y
        h = nn.Dense(self.config.hidden_dim, dtype=self.dtype, name="wi")(
            nn.LayerNorm(dtype=self.dtype, name="ln2")(x))
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="wo")(h)
        return x + h


class SegmentationExpert(_QueryDecoderExpert):
    """Mask tokens + boundary mixing (reference specialized_experts.py:15-173)."""
    num_queries: int = 8

    def head(self, q):
        # boundary refinement: depthwise mix along the query axis
        b = nn.Dense(q.shape[-1], dtype=self.dtype, name="boundary")(q)
        return q + jnp.tanh(b)


class ObjectDetectionExpert(_QueryDecoderExpert):
    """DETR-style object queries (reference specialized_experts.py:176-308)."""
    num_queries: int = 32

    def head(self, q):
        return q + nn.Dense(q.shape[-1], dtype=self.dtype, name="box_head")(q)


class OCRExpert(_QueryDecoderExpert):
    """Text-region queries + Vietnamese diacritic MLP
    (reference specialized_experts.py:311-459)."""
    num_queries: int = 16

    def head(self, q):
        d = nn.Dense(q.shape[-1], dtype=self.dtype, name="diacritic_fc1")(q)
        d = nn.gelu(d)
        d = nn.Dense(q.shape[-1], dtype=self.dtype, name="diacritic_fc2")(d)
        return q + d


class SceneUnderstandingExpert(nn.Module):
    """Scene tokens + global-context attention
    (reference specialized_experts.py:462-599)."""
    config: ExpertConfig
    num_scene_tokens: int = 8
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B = x.shape[0]
        scene = self.param("scene_tokens", nn.initializers.normal(0.02),
                           (1, self.num_scene_tokens, x.shape[-1]), jnp.float32)
        s = jnp.broadcast_to(scene, (B,) + scene.shape[1:]).astype(self.dtype)
        s = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            name="scene_attn")(s, x, deterministic=deterministic)
        g = s.mean(axis=1, keepdims=True)  # global scene context
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.config.num_heads, dtype=self.dtype,
            name="context_attn")(nn.LayerNorm(dtype=self.dtype, name="ln")(x),
                                 jnp.concatenate([s, g], axis=1),
                                 deterministic=deterministic)
        return x + y


class SpatialReasoningExpert(nn.Module):
    """Pairwise relational reasoning (reference specialized_experts.py:
    602-769). The O(L^2) pair features are formed by two projections and a
    broadcasted add — one einsum-able op, no pair loop."""
    config: ExpertConfig
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        D = x.shape[-1]
        xi = nn.Dense(D // 2, dtype=self.dtype, name="rel_src")(x)
        xj = nn.Dense(D // 2, dtype=self.dtype, name="rel_dst")(x)
        # (B, L, L, D/2) pair tensor via broadcast; relation MLP; aggregate
        pair = nn.gelu(xi[:, :, None, :] + xj[:, None, :, :])
        rel = nn.Dense(D // 2, dtype=self.dtype, name="rel_mlp")(pair)
        agg = rel.mean(axis=2)
        y = nn.Dense(D, dtype=self.dtype, name="rel_out")(agg)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(x + y)


class CountingExpert(_QueryDecoderExpert):
    """Count queries + density head (reference specialized_experts.py:771-897)."""
    num_queries: int = 8

    def head(self, q):
        density = nn.softplus(nn.Dense(1, dtype=self.dtype, name="density")(q))
        return q * density


SPECIALIZED_EXPERTS = {
    "segmentation": SegmentationExpert,
    "object_detection": ObjectDetectionExpert,
    "ocr": OCRExpert,
    "scene_understanding": SceneUnderstandingExpert,
    "spatial_reasoning": SpatialReasoningExpert,
    "counting": CountingExpert,
}
