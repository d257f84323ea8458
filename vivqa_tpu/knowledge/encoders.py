"""Knowledge encoders: text / visual / multimodal.

Counterpart of src/modeling/knowledge_base/knowledge_encoder.py:85-735 in
the reference (HF-encoder wrappers). Here encoders wrap OUR flax
encoders: the caller provides a model + params (or uses the lightweight
hash-projection fallback when no trained encoder is available — useful
for tests and for BM25-hybrid setups where dense quality matters less).
Batched + jitted encode paths.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import jax
import numpy as np


class HashingTextEncoder:
    """Deterministic feature-hashing text encoder (no params): tokens ->
    signed hash buckets, L2-normalized. A dependable dense fallback when
    no trained text tower is supplied."""

    def __init__(self, dim: int = 256, ngrams: int = 2):
        self.dim = dim
        self.ngrams = ngrams

    def _tokens(self, text: str):
        from vivqa_tpu.knowledge.vietnamese import (VietnameseTokenizer,
                                                    normalize_vietnamese_text)
        toks = VietnameseTokenizer().tokenize(
            normalize_vietnamese_text(text))
        grams = list(toks)
        for n in range(2, self.ngrams + 1):
            grams += [" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)]
        return grams

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for g in self._tokens(t):
                h = int(hashlib.md5(g.encode()).hexdigest(), 16)
                sign = 1.0 if (h >> 64) & 1 else -1.0
                out[i, h % self.dim] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


class TextKnowledgeEncoder:
    """Wraps a flax TextEncoder (+params) for batched pooled embeddings
    (reference :85-280). Falls back to HashingTextEncoder without one."""

    def __init__(self, model=None, params=None, tokenizer=None,
                 dim: int = 256, batch_size: int = 32):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self._fallback = HashingTextEncoder(dim) if model is None else None
        if model is not None:
            import jax.numpy as jnp

            def fwd(params, ids, mask):
                return model.apply({"params": params}, ids, mask,
                                   deterministic=True)["pooled"]
            self._fwd = jax.jit(fwd)

    @property
    def dim(self) -> int:
        if self._fallback is not None:
            return self._fallback.dim
        return self.model.config.output_dim or self.model.config.hidden_dim

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if self._fallback is not None:
            return self._fallback.encode(texts)
        import jax.numpy as jnp
        outs = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start:start + self.batch_size])
            pad = 0
            if len(chunk) < self.batch_size:
                pad = self.batch_size - len(chunk)
                chunk = chunk + [chunk[-1]] * pad
            enc = self.tokenizer.encode_batch(chunk)
            emb = self._fwd(self.params, jnp.asarray(enc["input_ids"]),
                            jnp.asarray(enc["attention_mask"]))
            emb = np.asarray(emb, np.float32)
            outs.append(emb[: len(emb) - pad] if pad else emb)
        from vivqa_tpu.knowledge.vector_store import normalize_rows
        return normalize_rows(np.concatenate(outs, 0))


class VisualKnowledgeEncoder:
    """Wraps a flax visual encoder for image embeddings (reference
    :282-463)."""

    def __init__(self, model, params, image_size: int = 224,
                 batch_size: int = 16):
        from vivqa_tpu.data.augmentation import ImageAugmentation
        self.model = model
        self.params = params
        self.transform = ImageAugmentation(image_size, mode="eval")
        self.batch_size = batch_size

        def fwd(params, px):
            return model.apply({"params": params}, px,
                               deterministic=True)["pooled"]
        self._fwd = jax.jit(fwd)

    def encode(self, images: Sequence) -> np.ndarray:
        import jax.numpy as jnp
        from vivqa_tpu.knowledge.vector_store import normalize_rows
        outs = []
        for start in range(0, len(images), self.batch_size):
            chunk = [self.transform(im)
                     for im in images[start:start + self.batch_size]]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = chunk + [chunk[-1]] * pad
            emb = np.asarray(self._fwd(self.params,
                                       jnp.asarray(np.stack(chunk))),
                             np.float32)
            outs.append(emb[: len(emb) - pad] if pad else emb)
        return normalize_rows(np.concatenate(outs, 0))


class MultimodalKnowledgeEncoder:
    """Fuses text + visual embeddings: concat | add | mean
    (reference :465-682)."""

    def __init__(self, text_encoder: TextKnowledgeEncoder,
                 visual_encoder: Optional[VisualKnowledgeEncoder] = None,
                 fuse: str = "concat"):
        assert fuse in ("concat", "add", "mean")
        self.text = text_encoder
        self.visual = visual_encoder
        self.fuse = fuse

    def encode(self, texts: Sequence[str],
               images: Optional[Sequence] = None) -> np.ndarray:
        t = self.text.encode(texts)
        if images is None or self.visual is None:
            return t
        v = self.visual.encode(images)
        if self.fuse == "concat":
            out = np.concatenate([t, v], axis=-1)
        elif self.fuse == "add":
            d = min(t.shape[-1], v.shape[-1])
            out = t[:, :d] + v[:, :d]
        else:
            d = min(t.shape[-1], v.shape[-1])
            out = 0.5 * (t[:, :d] + v[:, :d])
        from vivqa_tpu.knowledge.vector_store import normalize_rows
        return normalize_rows(out)


def create_text_knowledge_encoder(**kwargs) -> TextKnowledgeEncoder:
    return TextKnowledgeEncoder(**kwargs)


def create_multimodal_knowledge_encoder(**kwargs) -> MultimodalKnowledgeEncoder:
    return MultimodalKnowledgeEncoder(**kwargs)
