"""Eval subsystem tests: predictor, result manager, evaluator."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.data import (BatchLoader, ImageAugmentation, VQADataset,
                            WhitespaceTokenizer, build_answer_vocab,
                            synthetic_samples, vqa_collate)
from vivqa_tpu.eval import (EvaluatorConfig, InferenceResultManager,
                            PredictionResult, VQAEvaluator, VQAPredictor)
from vivqa_tpu.models.config import (FusionConfig, TextEncoderConfig,
                                     VisualEncoderConfig, VQAModelConfig)
from vivqa_tpu.models.vqa_model import VietnameseVQAModel


@pytest.fixture(scope="module")
def predictor_setup():
    samples = synthetic_samples(12)
    tok = WhitespaceTokenizer(max_length=8)
    tok.build_vocab([s.question for s in samples] +
                    [a for s in samples for a in s.answers])
    a2i, i2a = build_answer_vocab(samples)
    cfg = VQAModelConfig(
        visual=VisualEncoderConfig(image_size=16, patch_size=8,
                                   hidden_dim=32, num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                               num_layers=1, num_heads=2, max_length=8),
        fusion=FusionConfig(fusion_type="concat", hidden_dim=32,
                            num_heads=2, num_layers=1),
        num_answers=len(a2i))
    model = VietnameseVQAModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                        jnp.ones((2, 8), jnp.int32))["params"]
    return model, params, tok, a2i, i2a, samples


def test_predictor_single_and_batch(predictor_setup):
    model, params, tok, a2i, i2a, samples = predictor_setup
    pred = VQAPredictor(model, params, tok, i2a, image_size=16, top_k=3,
                        batch_pad=4)
    img = np.random.rand(16, 16, 3).astype(np.float32)
    r = pred.predict(img, "con mèo màu gì?")
    assert isinstance(r, PredictionResult)
    assert r.answer in i2a.values()
    assert 0 <= r.confidence <= 1
    assert len(r.top_answers) == 3
    assert r.top_answers[0]["confidence"] >= r.top_answers[1]["confidence"]

    # batch path pads to batch_pad multiple but returns exactly N results
    imgs = [np.random.rand(16, 16, 3).astype(np.float32) for _ in range(5)]
    qs = [s.question for s in samples[:5]]
    results = pred.predict_batch(imgs, qs)
    assert len(results) == 5
    assert all(res.question == q for res, q in zip(results, qs))


def test_result_manager_exports(predictor_setup, tmp_path):
    mgr = InferenceResultManager(metadata={"model": "test"})
    mgr.add(PredictionResult("q1?", "mèo", 0.9,
                             [{"answer": "mèo", "confidence": 0.9}], 12.0))
    mgr.add(PredictionResult("q2?", "chó", 0.6,
                             [{"answer": "chó", "confidence": 0.6}], 8.0))
    assert len(mgr) == 2
    p_json = mgr.save_json(tmp_path / "r.json")
    p_csv = mgr.save_csv(tmp_path / "r.csv")
    p_jsonl = mgr.save_jsonl(tmp_path / "r.jsonl")
    assert json.loads(p_json.read_text())["metadata"]["model"] == "test"
    assert "question" in p_csv.read_text().splitlines()[0]
    assert len(p_jsonl.read_text().splitlines()) == 2
    s = mgr.summary()
    assert s["num_results"] == 2
    assert np.isclose(s["mean_confidence"], 0.75)
    assert s["p50_inference_ms"] == 10.0
    # human-readable dump + reload
    assert "mèo" in mgr.sample_dump(1)
    mgr2 = InferenceResultManager.load(p_json)
    assert len(mgr2) == 2


def test_evaluator_question_types_and_errors(predictor_setup, tmp_path):
    model, params, tok, a2i, i2a, samples = predictor_setup
    ds = VQADataset(samples, tok, a2i,
                    ImageAugmentation(16, "eval"), max_question_length=8)
    loader = BatchLoader(ds, 4, vqa_collate, shuffle=False, drop_last=False)
    ev = VQAEvaluator(EvaluatorConfig(output_dir=str(tmp_path)))
    result = ev.evaluate(model, params, loader, i2a)
    assert result.num_samples == len(samples)
    assert "vqa_accuracy" in result.metrics
    assert result.per_question_type            # Vietnamese keyword types
    assert all(0 <= v["accuracy"] <= 1
               for v in result.per_question_type.values())
    path = ev.save(result)
    saved = json.loads(path.read_text())
    assert "error_analysis" in saved
