#!/usr/bin/env bash
# Quick command reference (reference: QUICK_REFERENCE.sh). This prints
# the common workflows; it does not execute anything.
cat <<'EOF'
=========================================================================
 ViVQA TPU — quick reference
=========================================================================

# 1. Train classification VQA (CLIP-ViT + PhoBERT + MCAN)
bash vivqa_tpu/cli/run_pipeline.sh --mode train \
    --config configs/pipeline_config.yaml \
    --csv-path data/vivqa/data.csv --image-dir data/vivqa/images

# 2. Evaluate a checkpoint
bash vivqa_tpu/cli/run_pipeline.sh --mode evaluate \
    --config configs/pipeline_config.yaml --resume checkpoints/vqa

# 3. Batch inference (JSON export)
bash vivqa_tpu/cli/run_pipeline.sh --mode inference \
    --config configs/pipeline_config.yaml --resume checkpoints/vqa

# 4. Train generative VQA (encoder-decoder, beam decode validation)
bash vivqa_tpu/cli/run_generative.sh --mode train \
    --config configs/generative_configs.yaml

# 5. Interactive generative demo (REPL)
bash vivqa_tpu/cli/run_generative.sh --mode demo \
    --config configs/generative_configs.yaml --resume checkpoints/generative

# 6. External ViVQA test-set evaluation from a checkpoint
bash vivqa_tpu/cli/run_vivqa_eval.sh \
    --checkpoint-dir checkpoints/generative \
    --csv-path data/vivqa_test.csv --image-dir data/coco

# 7. MoE ablation study (expert/router sweeps, resumable)
bash vivqa_tpu/cli/run_ablation.sh --config configs/ablation_configs.yaml \
    --csv-path data/vivqa/data.csv --image-dir data/vivqa/images --dry-run
bash vivqa_tpu/cli/run_ablation.sh --config configs/ablation_configs.yaml \
    --csv-path data/vivqa/data.csv --image-dir data/vivqa/images \
    --experiments 0-5

# 8. Tests (8 virtual CPU devices) and benchmark (real TPU)
python -m pytest tests/ -q
python bench.py

# 9. Build the native fast image loader
bash native/build.sh
=========================================================================
EOF
