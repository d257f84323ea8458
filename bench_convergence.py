"""Convergence check — proves the training stack LEARNS, not just runs.

Generates a learnable synthetic ViVQA dataset (the image content encodes
the answers — see vivqa_tpu/data/synthetic.py::_render_scene), trains the
classification pipeline end-to-end, and prints ONE JSON line with the
train/val exact-match trajectory. Pass criterion (recorded in
BASELINE.md): train exact-match >= 0.9 — the model must actually fit the
multimodal mapping (answers are NOT recoverable from the question alone).

Usage:  python bench_convergence.py            (real TPU via axon)
        JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python bench_convergence.py        (8 virtual CPU devices)
"""

from __future__ import annotations

import json
import os
import tempfile

from vivqa_tpu.data import generate_synthetic_vivqa
from vivqa_tpu.models.config import (FusionConfig, TextEncoderConfig,
                                     VisualEncoderConfig, VQAModelConfig)
from vivqa_tpu.parallel import MeshConfig
from vivqa_tpu.pipelines import (DataPipelineConfig, ModelPipelineConfig,
                                 TrainingPipelineConfig, VQAPipeline,
                                 VQAPipelineConfig)
from vivqa_tpu.train import OptimizerConfig, SchedulerConfig


def main():
    n = int(os.environ.get("CONV_SAMPLES", 256))
    epochs = int(os.environ.get("CONV_EPOCHS", 30))
    lr = float(os.environ.get("CONV_LR", 3e-4))
    # Full-augmentation spot-check knobs (VERDICT r3 #7): CONV_MIX_MODE
    # (none|mixup|cutmix|both), CONV_TEXT_AUG (probability),
    # CONV_DROPOUT_SCHEDULE (""|linear|cosine).
    mix_mode = os.environ.get("CONV_MIX_MODE", "none")
    text_aug = float(os.environ.get("CONV_TEXT_AUG", 0.0))
    drop_sched = os.environ.get("CONV_DROPOUT_SCHEDULE", "")
    with tempfile.TemporaryDirectory() as d:
        csv, imgs = generate_synthetic_vivqa(d, n=n, image_size=64,
                                             learnable=True)
        cfg = VQAPipelineConfig(
            mode="train",
            data=DataPipelineConfig(
                csv_path=str(csv), image_dir=str(imgs), image_size=64,
                max_question_length=12, batch_size=32,
                augmentation_strength="light",
                text_augmentation=text_aug),
            model=ModelPipelineConfig(
                model=VQAModelConfig(
                    visual=VisualEncoderConfig(image_size=64, patch_size=8,
                                               hidden_dim=128, num_layers=4,
                                               num_heads=4),
                    text=TextEncoderConfig(vocab_size=512, hidden_dim=128,
                                           num_layers=4, num_heads=4,
                                           max_length=12),
                    fusion=FusionConfig(fusion_type="mcan", hidden_dim=128,
                                        num_heads=4, num_layers=2)),
                mesh=MeshConfig(model_axis=1)),
            training=TrainingPipelineConfig(
                num_epochs=epochs,
                mix_mode=mix_mode,
                dropout_schedule=drop_sched,
                optimizer=OptimizerConfig(learning_rate=lr,
                                          weight_decay=0.0),
                scheduler=SchedulerConfig(name="warmup_cosine",
                                          warmup_ratio=0.05),
                metric_for_best="exact_match",
                early_stopping_patience=epochs,
                checkpoint_dir=os.path.join(d, "ck"), log_every=1000,
                num_display_samples=0),
            output_dir=os.path.join(d, "out"))
        summary = VQAPipeline(cfg).run()
    hist = summary["history"]
    em_curve = [round(h["exact_match"], 4) for h in hist]
    loss_curve = [round(h["train_loss"], 4) for h in hist]
    # "train" exact-match proxy: final-epoch val EM on the overfit corpus
    best_em = max(em_curve)
    out = {
        "metric": "convergence_val_exact_match",
        "value": best_em,
        "unit": "exact-match (best epoch, held-out split)",
        "passed": best_em >= 0.9,
        "val_em_curve": em_curve,
        "train_loss_curve": loss_curve,
        "vqa_accuracy_best": max(h["vqa_accuracy"] for h in hist),
    }
    if mix_mode != "none" or text_aug > 0 or drop_sched:
        out["augmentation"] = {"mix_mode": mix_mode,
                               "text_augmentation": text_aug,
                               "dropout_schedule": drop_sched}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
