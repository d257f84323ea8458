#!/usr/bin/env bash
##############################################################################
# ViVQA TPU framework — complete setup + evaluation bootstrap.
#
# TPU-native counterpart of the reference's setup_vivqa_pipeline.sh
# (env -> data -> model -> evaluation). Stages:
#   1. Environment check   python, jax, device inventory (TPU or CPU mesh)
#   2. Data                Kaggle ViVQA download, or --synthetic offline corpus
#   3. Model               HF snapshot download (optional, --model), or
#                          from-scratch config
#   4. Smoke run           one tiny end-to-end train run to validate the stack
#   5. Evaluation          full evaluate mode on the prepared data
#
# Usage:
#   bash setup_vivqa_pipeline.sh                      # full flow (needs egress)
#   bash setup_vivqa_pipeline.sh --synthetic          # fully offline
#   bash setup_vivqa_pipeline.sh --skip-data --skip-eval
#   bash setup_vivqa_pipeline.sh --help
##############################################################################
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
export PYTHONPATH="${REPO_ROOT}${PYTHONPATH:+:$PYTHONPATH}"

GREEN='\033[0;32m'; BLUE='\033[0;34m'; RED='\033[0;31m'
YELLOW='\033[1;33m'; NC='\033[0m'

DATA_DIR="data"
OUT_DIR="outputs/setup"
KAGGLE_DATASET="ngocuong/vivqa-60k"
HF_MODEL=""
SYNTHETIC=0
SKIP_DATA=0
SKIP_SMOKE=0
SKIP_EVAL=0

print_stage()   { echo -e "\n${BLUE}==> $1${NC}"; }
print_success() { echo -e "${GREEN}[ok]${NC} $1"; }
print_warn()    { echo -e "${YELLOW}[warn]${NC} $1"; }
print_fail()    { echo -e "${RED}[fail]${NC} $1" >&2; }

usage() {
  sed -n '2,20p' "$0" | sed 's/^# \{0,1\}//'
  exit 0
}

while [ $# -gt 0 ]; do
  case "$1" in
    --help|-h) usage;;
    --synthetic) SYNTHETIC=1; shift;;
    --skip-data) SKIP_DATA=1; shift;;
    --skip-smoke) SKIP_SMOKE=1; shift;;
    --skip-eval) SKIP_EVAL=1; shift;;
    --data-dir) DATA_DIR="$2"; shift 2;;
    --out-dir) OUT_DIR="$2"; shift 2;;
    --dataset) KAGGLE_DATASET="$2"; shift 2;;
    --model) HF_MODEL="$2"; shift 2;;
    *) print_fail "unknown flag $1"; exit 1;;
  esac
done

##############################################################################
print_stage "Stage 1/5 — environment"
##############################################################################
python - << 'PY'
import sys
print(f"  python {sys.version.split()[0]}")
import jax, flax, optax, orbax.checkpoint  # noqa: F401
print(f"  jax {jax.__version__}, flax {flax.__version__}")
devs = jax.devices()
print(f"  devices: {len(devs)} x {devs[0].platform}")
import vivqa_tpu
print("  vivqa_tpu import OK")
PY
print_success "environment validated"

##############################################################################
print_stage "Stage 2/5 — data"
##############################################################################
if [ "$SKIP_DATA" = "1" ]; then
  print_warn "skipping data stage (--skip-data)"
  CSV=""; IMAGES=""
elif [ "$SYNTHETIC" = "1" ]; then
  python - "$DATA_DIR" << 'PY'
import sys
from vivqa_tpu.data import generate_synthetic_vivqa
csv, imgs = generate_synthetic_vivqa(f"{sys.argv[1]}/synthetic", n=256,
                                     image_size=64, learnable=True)
print(f"  wrote {csv} + {imgs}")
PY
  CSV="$DATA_DIR/synthetic/data.csv"
  IMAGES="$DATA_DIR/synthetic/images"
  print_success "synthetic corpus ready (256 learnable samples)"
else
  bash vivqa_tpu/cli/download_data.sh "$KAGGLE_DATASET" --out-dir "$DATA_DIR"
  CSV="$DATA_DIR/texts/evaluate_60k_data_balanced_preprocessed.csv"
  IMAGES="$DATA_DIR/images"
  [ -f "$CSV" ] || { print_fail "download incomplete: $CSV missing"; exit 1; }
  print_success "ViVQA data ready ($(ls "$IMAGES" | wc -l) images)"
fi

##############################################################################
print_stage "Stage 3/5 — model weights"
##############################################################################
if [ -n "$HF_MODEL" ]; then
  bash vivqa_tpu/cli/download_model.sh "$HF_MODEL"
  print_success "HF snapshot of $HF_MODEL cached (convert with vivqa_tpu.models.convert)"
else
  print_warn "no --model given; pipelines will train from scratch"
fi

##############################################################################
print_stage "Stage 4/5 — smoke run (tiny end-to-end train)"
##############################################################################
if [ "$SKIP_SMOKE" = "1" ] || [ -z "$CSV" ]; then
  print_warn "skipping smoke run"
else
  python -m vivqa_tpu.pipelines.vqa_pipeline --mode train \
    --csv-path "$CSV" --image-dir "$IMAGES" \
    --batch-size 8 --epochs 1 --image-size 64 \
    --output-dir "$OUT_DIR/smoke"
  [ -f "$OUT_DIR/smoke/pipeline_summary.json" ] || {
    print_fail "smoke run produced no summary"; exit 1; }
  print_success "smoke train run OK ($OUT_DIR/smoke/pipeline_summary.json)"
fi

##############################################################################
print_stage "Stage 5/5 — evaluation"
##############################################################################
if [ "$SKIP_EVAL" = "1" ] || [ -z "$CSV" ]; then
  print_warn "skipping evaluation"
else
  # resume from the smoke run's checkpoints when present
  RESUME_ARGS=()
  if [ "$SKIP_SMOKE" != "1" ] && [ -d "checkpoints/vqa" ]; then
    RESUME_ARGS=(--resume "checkpoints/vqa")
  fi
  python -m vivqa_tpu.pipelines.vqa_pipeline --mode evaluate \
    --csv-path "$CSV" --image-dir "$IMAGES" \
    --batch-size 8 --image-size 64 \
    --output-dir "$OUT_DIR/eval" "${RESUME_ARGS[@]}"
  print_success "evaluation complete ($OUT_DIR/eval)"
fi

echo -e "\n${GREEN}Setup pipeline finished.${NC} Outputs in $OUT_DIR/"
