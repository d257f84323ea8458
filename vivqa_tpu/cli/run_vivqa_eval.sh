#!/usr/bin/env bash
# External ViVQA checkpoint evaluation (reference: vivqa_eval_cli).
set -euo pipefail
exec python -m vivqa_tpu.pipelines.vivqa_evaluation "$@"
