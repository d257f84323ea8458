"""RAG modules: batched context attention + retrieval-augmented fusion.

Counterpart of src/modeling/knowledge_base/rag_module.py:35-730 in the
reference: ContextEncoder, ContextAttention (MHA over retrieved
contexts), RAGModule (retrieve -> encode -> fuse with
attention/concat/gated/add strategies), KnowledgeAugmentedVQA wrapper,
RAGLoss. The reference applies RAG per-sample in a Python loop
(vqa_model.py:689-702); here retrieval is a host-side batched call and
fusion is one batched flax module.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.knowledge.retrievers import BaseRetriever


class ContextAttention(nn.Module):
    """Query vector attends over K retrieved context embeddings
    (reference :80-166)."""
    hidden_dim: int
    num_heads: int = 8
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, query, contexts, context_mask=None, *,
                 deterministic: bool = True):
        """query (B, D); contexts (B, K, Dk) -> (B, hidden_dim)."""
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_proj")(
            contexts.astype(self.dtype))
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_proj")(
            query.astype(self.dtype))[:, None]
        mask = None
        if context_mask is not None:
            mask = nn.make_attention_mask(
                jnp.ones((query.shape[0], 1), jnp.int32), context_mask,
                dtype=jnp.bool_)
        ctx = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(
            q, k, mask=mask, deterministic=deterministic)[:, 0]
        return nn.LayerNorm(dtype=self.dtype, name="ln")(ctx)


class RAGFusion(nn.Module):
    """Fuse a feature vector with attended knowledge:
    attention | concat | gated | add (reference RAGModule fuse :169-350)."""
    hidden_dim: int
    strategy: str = "attention"
    num_heads: int = 8
    residual_weight: float = 0.5
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features, contexts, context_mask=None, *,
                 deterministic: bool = True):
        ctx = ContextAttention(self.hidden_dim, self.num_heads,
                               name="context_attn")(
            features, contexts, context_mask, deterministic=deterministic)
        f = features.astype(self.dtype)
        if self.strategy == "attention" or self.strategy == "add":
            return f + self.residual_weight * ctx
        if self.strategy == "concat":
            h = jnp.concatenate([f, ctx], axis=-1)
            return nn.Dense(self.hidden_dim, dtype=self.dtype,
                            name="merge")(h)
        if self.strategy == "gated":
            gate = nn.sigmoid(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                       name="gate")(
                jnp.concatenate([f, ctx], axis=-1)))
            return gate * f + (1 - gate) * ctx
        raise ValueError(f"unknown RAG fusion strategy '{self.strategy}'")


@dataclasses.dataclass
class RAGModule:
    """Host-side retrieve + device-side fuse (reference :169-350).

    Usage:
        rag = RAGModule(retriever, knowledge_encoder, num_retrieved=5)
        ctx, mask, docs = rag.retrieve_batch(questions)     # host, numpy
        # feed ctx/mask into the model as knowledge_embeddings/mask
    """
    retriever: BaseRetriever
    encoder: object                      # TextKnowledgeEncoder-like
    num_retrieved: int = 5

    def retrieve_batch(self, questions: Sequence[str]):
        """-> (embeddings (B, K, D) float32, mask (B, K) int32, doc lists).
        Static K: short retrievals are zero-padded."""
        results = self.retriever.retrieve_batch(list(questions),
                                                self.num_retrieved)
        B, K = len(questions), self.num_retrieved
        dim = self.encoder.dim if hasattr(self.encoder, "dim") else None
        all_texts, spans = [], []
        for res in results:
            texts = [r.document.content if r.document else "" for r in res]
            spans.append(len(texts))
            all_texts.extend(texts)
        if all_texts:
            flat = self.encoder.encode(all_texts)
            dim = flat.shape[-1]
        else:
            flat = np.zeros((0, dim or 256), np.float32)
            dim = flat.shape[-1]
        emb = np.zeros((B, K, dim), np.float32)
        mask = np.zeros((B, K), np.int32)
        pos = 0
        for i, n in enumerate(spans):
            emb[i, :n] = flat[pos:pos + n]
            mask[i, :n] = 1
            pos += n
        return emb, mask, results


def rag_loss(answer_loss: jnp.ndarray, retrieval_scores: jnp.ndarray,
             relevance: jnp.ndarray, retrieval_weight: float = 0.5):
    """Joint answer + retrieval loss (reference RAGLoss :602): a
    listwise softmax CE pushing relevant contexts to score higher."""
    logp = jax.nn.log_softmax(retrieval_scores.astype(jnp.float32), axis=-1)
    rel = relevance.astype(jnp.float32)
    rel = rel / jnp.maximum(rel.sum(-1, keepdims=True), 1e-6)
    retrieval = -(rel * logp).sum(-1).mean()
    return answer_loss + retrieval_weight * retrieval
