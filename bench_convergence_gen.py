"""Generative convergence check — proves the SEQ2SEQ stack LEARNS.

Counterpart of bench_convergence.py for the generative half of the
framework (VERDICT r2 #1): generates the learnable synthetic corpus with
compositional multi-token answers (seq_answers=True — "có hai con mèo
màu đỏ" style, so the decoder must compose count+object+color from the
IMAGE; answers are unrecoverable from the question), trains
GenerativeVQAModel end-to-end through GenerativeVQAPipeline (teacher
forcing, BLEU-best checkpointing), validates every epoch with the
KV-cached jitted decode, and prints ONE JSON line with the val
exact-match / BLEU trajectory.

Pass criterion (recorded in BASELINE.md): best val exact-match >= 0.85
with the greedy KV-cached decode; the final epoch also runs a beam-4
decode to certify the beam path on the fitted model.

Usage:  python bench_convergence_gen.py          (real TPU via axon)
        JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python bench_convergence_gen.py      (8 virtual CPU devices)

Env knobs (to fit <10-min TPU chunks): GEN_SAMPLES, GEN_EPOCHS, GEN_LR,
GEN_BEAMS (0 = skip the final beam eval), GEN_CKPT (persist checkpoints
for chunked resume via GEN_RESUME=1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

print("[bench_convergence_gen] starting (pre-device-init)...", flush=True)

from vivqa_tpu.data import ensure_synthetic_vivqa
from vivqa_tpu.models.config import (GenerativeVQAConfig, TextEncoderConfig,
                                     VisualEncoderConfig)
from vivqa_tpu.parallel import MeshConfig
from vivqa_tpu.pipelines import (DataPipelineConfig,
                                 GenerativeTrainingConfig,
                                 GenerativeVQAPipeline,
                                 GenerativeVQAPipelineConfig)
from vivqa_tpu.train import OptimizerConfig, SchedulerConfig


def main():
    n = int(os.environ.get("GEN_SAMPLES", 512))
    epochs = int(os.environ.get("GEN_EPOCHS", 60))
    lr = float(os.environ.get("GEN_LR", 1e-3))
    beams = int(os.environ.get("GEN_BEAMS", 4))
    dropout = float(os.environ.get("GEN_DROPOUT", 0.05))
    # GEN_MODEL=flagship trains the FULL bench_serving.py model shape on
    # the synthetic corpus. Purpose: a fitted flagship checkpoint that
    # emits real EOS at realistic 1-6-token answers, so the production
    # early_exit=True decode can be measured in wall-clock at the scale
    # where it matters (the demo-size model decodes under the tunnel's
    # ~2.7 ms/call dispatch floor — unmeasurable). A few epochs suffice:
    # the checkpoint needs EOS behavior, not accuracy.
    flagship = os.environ.get("GEN_MODEL", "") == "flagship"
    # "medium" (rotation/translate/erasing) spatially scrambles the
    # per-image noise so the decoder can't memorize it as a sample key —
    # the coarse scene codes survive; "light" lets a high-capacity
    # seq2seq head overfit noise (observed: train loss 0.02, val EM 0.12)
    aug = os.environ.get("GEN_AUG", "medium")
    wd = float(os.environ.get("GEN_WD", 0.01))
    img_size = 224 if flagship else 64
    with tempfile.TemporaryDirectory() as d:
        # GEN_CORPUS_DIR caches the rendered corpus across chunked runs
        # (224^2 flagship rendering costs minutes on a 1-core host; the
        # corpus is deterministic in (n, image_size, seed) so reuse is
        # bit-identical to regeneration). ensure_ verifies the cache's
        # manifest and raises on a stale/mismatched cache instead of
        # silently resizing it.
        corpus_dir = os.environ.get("GEN_CORPUS_DIR") or d
        csv, imgs = ensure_synthetic_vivqa(corpus_dir, n=n,
                                           image_size=img_size,
                                           learnable=True,
                                           seq_answers=True)
        print(f"[bench_convergence_gen] corpus ready ({n} samples); "
              "building pipeline (first compile ~20-40s on TPU)...",
              flush=True)
        ckpt_dir = os.environ.get("GEN_CKPT") or os.path.join(d, "ck")
        if flagship:
            # exact bench_serving.py main() model shape
            model_cfg = GenerativeVQAConfig(
                visual=VisualEncoderConfig(backbone="clip", image_size=224,
                                           patch_size=32, hidden_dim=768,
                                           num_layers=12, num_heads=12),
                text=TextEncoderConfig(backbone="phobert", vocab_size=64001,
                                       hidden_dim=768, num_layers=12,
                                       num_heads=12, max_length=64),
                fusion_dim=512, fusion_layers=3, fusion_heads=8,
                vocab_size=64001, decoder_layers=6, decoder_heads=8,
                decoder_dim=512, decoder_ff_dim=2048,
                max_answer_length=32, dropout=dropout,
                label_smoothing=0.0)
        else:
            model_cfg = GenerativeVQAConfig(
                visual=VisualEncoderConfig(image_size=64, patch_size=8,
                                           hidden_dim=128, num_layers=4,
                                           num_heads=4),
                text=TextEncoderConfig(vocab_size=512, hidden_dim=128,
                                       num_layers=2, num_heads=4,
                                       max_length=12),
                fusion_dim=128, fusion_layers=2, fusion_heads=4,
                decoder_layers=2, decoder_heads=4, decoder_dim=128,
                decoder_ff_dim=512, dropout=dropout, label_smoothing=0.0)
        cfg = GenerativeVQAPipelineConfig(
            mode="train",
            data=DataPipelineConfig(
                csv_path=str(csv), image_dir=str(imgs),
                image_size=img_size,
                max_question_length=model_cfg.text.max_length
                if flagship else 12,
                max_answer_length=model_cfg.max_answer_length
                if flagship else 10,
                batch_size=32, augmentation_strength=aug,
                generative=True),
            model=model_cfg,
            training=GenerativeTrainingConfig(
                num_epochs=epochs,
                optimizer=OptimizerConfig(learning_rate=lr,
                                          weight_decay=wd),
                scheduler=SchedulerConfig(name="warmup_cosine",
                                          warmup_ratio=0.05),
                label_smoothing=0.0,
                metric_for_best="bleu",
                early_stopping_patience=epochs,
                decode_strategy="greedy",
                checkpoint_dir=ckpt_dir, log_every=1000),
            mesh=MeshConfig(model_axis=1),
            resume=ckpt_dir if os.environ.get("GEN_RESUME") else "",
            output_dir=os.path.join(d, "out"))
        summary = GenerativeVQAPipeline(cfg).run()
        hist = summary["history"]
        em_curve = [round(h["exact_match"], 4) for h in hist]
        bleu_curve = [round(h["bleu"], 4) for h in hist]
        loss_curve = [round(h["train_loss"], 4) for h in hist]
        best_em = max(em_curve)

        beam_em = None
        if beams:
            # certify the beam path on the fitted model: re-evaluate the
            # BLEU-best checkpoint with beam search
            cfg_b = cfg.replace(
                mode="evaluate", resume=ckpt_dir,
                training=cfg.training.replace(decode_strategy="beam",
                                              num_beams=beams))
            res = GenerativeVQAPipeline(cfg_b).run()
            beam_em = round(res["metrics"]["exact_match"], 4)

    out = {
        "metric": "gen_convergence_val_exact_match",
        "value": best_em,
        "unit": "exact-match (best epoch, held-out split, greedy decode)",
        "passed": best_em >= 0.85,
        "val_em_curve": em_curve,
        "val_bleu_curve": bleu_curve,
        "train_loss_curve": loss_curve,
        "bleu_best": max(bleu_curve),
    }
    if beam_em is not None:
        out[f"beam{beams}_exact_match"] = beam_em
    print(json.dumps(out))


if __name__ == "__main__":
    main()
