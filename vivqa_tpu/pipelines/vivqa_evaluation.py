"""Checkpoint-only evaluation on an external ViVQA CSV.

Counterpart of src/core/vivqa_evaluation_pipeline.py:53-525 and
vivqa_eval_cli.py in the reference: loads a generative checkpoint,
rebuilds the model config from checkpoint metadata, runs the inference
loop over an `img_id`-keyed CSV, decodes, computes EM / token-level
P-R-F1 / BLEU / ROUGE / METEOR / CIDEr, and exports predictions +
metrics JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.data import (BatchLoader, GenerativeVQADataset,
                            ImageAugmentation, OneSample, create_tokenizer,
                            generative_collate)
from vivqa_tpu.metrics import (BLEUScore, CIDErScore, ExactMatchAccuracy,
                               METEORScore, PrecisionRecallF1, ROUGEScore)
from vivqa_tpu.models.config import GenerativeVQAConfig
from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
from vivqa_tpu.models.generative import GenerativeVQAModel
from vivqa_tpu.train.checkpoint import (CheckpointConfig, CheckpointManager,
                                        partial_load)
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass(frozen=True)
class VivqaEvaluationConfig(ConfigBase):
    checkpoint_dir: str = ""
    csv_path: str = ""
    image_dir: str = ""
    image_size: int = 224
    batch_size: int = 16
    max_question_length: int = 64
    max_answer_length: int = 64
    decode_strategy: str = "greedy"
    num_beams: int = 4
    output_dir: str = "outputs/vivqa_eval"
    max_samples: int = 0


def load_vivqa_csv(csv_path, image_dir, max_samples=0):
    """ViVQA CSV uses `img_id` (+ COCO zero-padded file resolution,
    reference vivqa_dataset.py:126-177) with `question`,`answer` columns."""
    import pandas as pd
    from vivqa_tpu.data.actions import build_image_index
    df = pd.read_csv(csv_path)
    qcol = "question"
    acol = "answer" if "answer" in df.columns else "answers"
    icol = "img_id" if "img_id" in df.columns else "image_link"
    index = build_image_index(image_dir) if image_dir else {}
    samples = []
    for _, row in df.iterrows():
        img = str(row[icol])
        path = None
        for cand in (img, f"{img}.jpg", f"{int(row[icol]):012d}.jpg"
                     if str(row[icol]).isdigit() else img):
            if cand in index:
                path = index[cand]
                break
        from vivqa_tpu.data.actions import parse_answers
        samples.append(OneSample(image_path=path or img,
                                 question=str(row[qcol]),
                                 answers=parse_answers(row[acol])))
        if max_samples and len(samples) >= max_samples:
            break
    return samples


def load_model_from_checkpoint(ckpt_dir: str, logger=None):
    """Rebuild GenerativeVQAConfig from checkpoint metadata then load
    weights (reference vivqa_eval_cli.py:30)."""
    mgr = CheckpointManager(CheckpointConfig(directory=ckpt_dir))
    restored, meta = mgr.restore_best()
    mgr.close()
    cfg_dict = meta.get("config")
    if not cfg_dict:
        raise ValueError(f"checkpoint at {ckpt_dir} has no model config "
                         "metadata")
    cfg = GenerativeVQAConfig.from_dict(cfg_dict)
    model = GenerativeVQAModel(cfg)
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    px = jnp.zeros((1, cfg.visual.image_size, cfg.visual.image_size, 3))
    q = jnp.ones((1, cfg.text.max_length), jnp.int32)
    d = jnp.zeros((1, cfg.max_answer_length), jnp.int32)
    params = model.init({"params": rng, "router": rng}, px, q, d)["params"]
    params, _ = partial_load(restored.get("params", restored), params, logger)
    # partial_load keeps Orbax's host-numpy leaves; place the tree on
    # device ONCE so per-batch jitted calls don't re-upload it each time
    # (measured as a 50x slowdown on the tunnel: bench_serving.py fitted
    # mode before this fix).
    params = jax.device_put(params)
    return model, params, meta


class VivqaEvaluationPipeline:
    def __init__(self, config: VivqaEvaluationConfig):
        self.config = config
        self.log = get_pipeline_logger(reset=True, name="vivqa_eval")

    def evaluate(self, model=None, params=None, tokenizer=None) -> dict:
        cfg = self.config
        log = self.log
        log.section("ViVQA EXTERNAL EVALUATION")

        if model is None:
            model, params, _ = load_model_from_checkpoint(
                cfg.checkpoint_dir, log)
        samples = load_vivqa_csv(cfg.csv_path, cfg.image_dir,
                                 cfg.max_samples)
        log.key_value("samples", len(samples))
        if tokenizer is None:
            corpus = [s.question for s in samples] + \
                     [a for s in samples for a in s.answers]
            tokenizer = create_tokenizer(None, cfg.max_question_length,
                                         corpus)

        ds = GenerativeVQADataset(
            samples, tokenizer,
            ImageAugmentation(cfg.image_size, mode="eval"),
            cfg.max_question_length, cfg.max_answer_length)
        loader = BatchLoader(ds, cfg.batch_size, generative_collate,
                             shuffle=False, drop_last=False)

        m = model.config
        gen_fn = jax.jit(build_generate_fn(model, DecodeConfig(
            max_length=m.max_answer_length, bos_token_id=m.bos_token_id,
            eos_token_id=m.eos_token_id, pad_token_id=m.pad_token_id,
            strategy=cfg.decode_strategy, num_beams=cfg.num_beams)))

        bleu, meteor, rouge = BLEUScore(), METEORScore(), ROUGEScore()
        cider, em, prf = CIDErScore(), ExactMatchAccuracy(), PrecisionRecallF1()
        predictions = []
        import jax.numpy as jnp
        for batch in loader:
            seqs, _ = gen_fn(params, jnp.asarray(batch["pixel_values"]),
                             jnp.asarray(batch["question_ids"]),
                             jnp.asarray(batch["question_mask"]))
            preds = [tokenizer.decode(s) for s in np.asarray(seqs)]
            refs = batch["all_answers"]
            bleu.update(preds, refs)
            meteor.update(preds, refs)
            rouge.update(preds, refs)
            cider.update(preds, refs)
            em.update(preds, refs)
            prf.update(preds, refs)
            for q, p, r in zip(batch["question"], preds, refs):
                predictions.append({"question": q, "prediction": p,
                                    "references": r})

        prf_r = prf.compute()
        rouge_r = rouge.compute()
        metrics = {
            "exact_match": em.compute().value,
            "precision": prf_r.metadata["precision"],
            "recall": prf_r.metadata["recall"],
            "f1": prf_r.value,
            "bleu": bleu.compute().value,
            "meteor": meteor.compute().value,
            "rouge_l": rouge_r.value,
            "rouge1": rouge_r.metadata["rouge1"],
            "cider": cider.compute().value,
        }
        log.log_metrics(metrics, prefix="vivqa/")

        out = Path(cfg.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "predictions.json").write_text(
            json.dumps(predictions, ensure_ascii=False, indent=2))
        (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
        log.success(f"results saved to {out}")
        return {"metrics": metrics, "num_samples": len(samples)}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description="ViVQA checkpoint evaluation")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--csv-path", required=True)
    p.add_argument("--image-dir", default="")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--decode", default="greedy")
    p.add_argument("--num-beams", type=int, default=4)
    p.add_argument("--output-dir", default="outputs/vivqa_eval")
    p.add_argument("--max-samples", type=int, default=0)
    args = p.parse_args(argv)
    cfg = VivqaEvaluationConfig(
        checkpoint_dir=args.checkpoint_dir, csv_path=args.csv_path,
        image_dir=args.image_dir, batch_size=args.batch_size,
        decode_strategy=args.decode, num_beams=args.num_beams,
        output_dir=args.output_dir, max_samples=args.max_samples)
    return VivqaEvaluationPipeline(cfg).evaluate()


if __name__ == "__main__":
    main()
