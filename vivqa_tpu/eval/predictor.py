"""Inference predictor for classification VQA.

Counterpart of src/modeling/inference/vqa_predictor.py:79-614 in the
reference: single & batch prediction with image preprocessing from
path/PIL/array, top-k answer decoding with confidences, and timing.
The forward pass is jitted once; batches pad to a fixed size so the jit
cache stays warm.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.data.augmentation import ImageAugmentation


@dataclasses.dataclass
class PredictionResult:
    question: str
    answer: str
    confidence: float
    top_answers: List[Dict]
    inference_ms: float


class VQAPredictor:
    def __init__(self, model, params, tokenizer, id2answer: Dict[int, str],
                 image_size: int = 224, top_k: int = 5,
                 max_question_length: Optional[int] = None,
                 batch_pad: int = 8):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.id2answer = id2answer
        self.top_k = top_k
        self.max_q = max_question_length or getattr(tokenizer, "max_length", 64)
        self.transform = ImageAugmentation(image_size, mode="eval")
        self.batch_pad = batch_pad

        def forward(params, px, ids, mask):
            out = model.apply({"params": params}, px, ids, mask,
                              deterministic=True)
            return jax.nn.softmax(out["logits"], axis=-1)
        self._forward = jax.jit(forward)

    # -- internals ---------------------------------------------------------
    def _decode(self, probs: np.ndarray, question: str,
                dt_ms: float) -> PredictionResult:
        order = np.argsort(-probs)[: self.top_k]
        top = [{"answer": self.id2answer.get(int(i), "<unk>"),
                "confidence": float(probs[i])} for i in order]
        return PredictionResult(question=question, answer=top[0]["answer"],
                                confidence=top[0]["confidence"],
                                top_answers=top, inference_ms=dt_ms)

    def _pad(self, arr: np.ndarray) -> np.ndarray:
        n = arr.shape[0]
        pad = (-n) % self.batch_pad
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, 0)], 0)
        return arr

    # -- public API ---------------------------------------------------------
    def predict(self, image, question: str) -> PredictionResult:
        px = self.transform(image)[None]
        return self.predict_arrays(px[0], question)

    def predict_arrays(self, pixel_values: np.ndarray,
                       question: str) -> PredictionResult:
        enc = self.tokenizer.encode_batch([question], self.max_q)
        t0 = time.perf_counter()
        probs = self._forward(self.params,
                              jnp.asarray(pixel_values)[None],
                              jnp.asarray(enc["input_ids"]),
                              jnp.asarray(enc["attention_mask"]))
        probs = np.asarray(probs[0], np.float32)
        dt = (time.perf_counter() - t0) * 1000
        return self._decode(probs, question, dt)

    def predict_batch(self, images: Sequence, questions: Sequence[str],
                      result_manager=None) -> List[PredictionResult]:
        px = self._pad(np.stack([self.transform(im) for im in images]))
        enc = self.tokenizer.encode_batch(list(questions), self.max_q)
        ids = self._pad(enc["input_ids"])
        mask = self._pad(enc["attention_mask"])
        t0 = time.perf_counter()
        probs = np.asarray(self._forward(self.params, jnp.asarray(px),
                                         jnp.asarray(ids),
                                         jnp.asarray(mask)), np.float32)
        dt = (time.perf_counter() - t0) * 1000 / max(len(questions), 1)
        results = [self._decode(probs[i], q, dt)
                   for i, q in enumerate(questions)]
        if result_manager is not None:
            for r in results:
                result_manager.add(r)
        return results


def load_predictor(ckpt_dir: str, model_config=None, tokenizer=None,
                   **kwargs) -> VQAPredictor:
    """Rebuild a predictor from a checkpoint directory (reference
    load_predictor, vqa_predictor.py:616)."""
    from vivqa_tpu.pipelines.model_pipeline import (ModelPipeline,
                                                    ModelPipelineConfig)
    cfg = ModelPipelineConfig(model=model_config) if model_config \
        else ModelPipelineConfig()
    out, meta = ModelPipeline(cfg).load_checkpoint(ckpt_dir)
    vocab = meta.get("vocabulary", {})
    id2answer = {int(k): v for k, v in vocab.items()} if vocab else {}
    if tokenizer is None:
        from vivqa_tpu.data.tokenizer import WhitespaceTokenizer
        tokenizer = WhitespaceTokenizer()
    return VQAPredictor(out.model, out.params, tokenizer, id2answer, **kwargs)
