#!/usr/bin/env bash
# Classification VQA pipeline wrapper (reference: src/cli/run_pipeline.sh).
# Usage: bash vivqa_tpu/cli/run_pipeline.sh --mode train --config configs/pipeline_config.yaml [...]
set -euo pipefail
GREEN='\033[0;32m'; CYAN='\033[0;36m'; NC='\033[0m'
echo -e "${CYAN}========================================${NC}"
echo -e "${GREEN}  ViVQA TPU — classification pipeline${NC}"
echo -e "${CYAN}========================================${NC}"
exec python -m vivqa_tpu.pipelines.vqa_pipeline "$@"
