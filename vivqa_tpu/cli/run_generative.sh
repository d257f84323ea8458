#!/usr/bin/env bash
# Generative VQA pipeline wrapper (reference: src/cli/ generative scripts).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
export PYTHONPATH="${REPO_ROOT}${PYTHONPATH:+:$PYTHONPATH}"
GREEN='\033[0;32m'; CYAN='\033[0;36m'; NC='\033[0m'
echo -e "${CYAN}========================================${NC}"
echo -e "${GREEN}  ViVQA TPU — generative pipeline${NC}"
echo -e "${CYAN}========================================${NC}"
exec python -m vivqa_tpu.pipelines.generative_vqa_pipeline "$@"
