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

# 8. One-command bootstrap (env -> data -> model -> smoke train -> eval)
bash setup_vivqa_pipeline.sh                 # Kaggle download (needs egress)
bash setup_vivqa_pipeline.sh --synthetic     # fully offline
bash vivqa_tpu/cli/quick_start.sh --synthetic --epochs 5

# 9. Data / model downloads and clean-output runs
bash vivqa_tpu/cli/download_data.sh ngocuong/vivqa-60k --out-dir data
bash vivqa_tpu/cli/download_model.sh vinai/phobert-base
bash vivqa_tpu/cli/run_clean.sh --mode train ...   # warnings suppressed

# 10. Tests (8 virtual CPU devices) and benchmarks (real TPU)
python -m pytest tests/ -q
python bench.py                    # train QA-pairs/sec/chip
python bench_serving.py            # generative answers/sec + p50/p95
python bench_convergence.py        # learnable-corpus accuracy check
python tools/bench_input_pipeline.py   # host input pipeline img/s

# 11. Build the native fast image loader (training + eval input path)
bash native/build.sh

# 12. Tutorials (runnable, sectioned walkthroughs)
python examples/complete_vqa_pipeline.py     # end-to-end classification
python examples/vivqa_examples.py            # generative + external eval
python examples/moe_examples.py              # routers/experts/ablation masks
=========================================================================
EOF
