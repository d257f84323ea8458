#!/usr/bin/env bash
# Round-5 ablation positive control (VERDICT r4 #3) — see study.yaml.
# Model: STARVED trunk (--hidden-dim 64 --num-layers 2) + full-capacity
# specialized experts (--expert-hidden-dim 1024). Same corpus recipe as
# the r3 study (1,024-sample learnable synthetic, 64x64, seed 0).
#
# Matrix (26 rows, `--dry-run` to list): the study RUNS
#   0,1          full + no_moe (retrained baselines; plant-1 result)
#   3,5,...,25   the 12 ph_* post-hoc rows (eval-time masks on the
#                trained full baseline — the positive control)
#   14,16        two RETRAINED leave-one-out rows (expected null,
#                in-study contrast with their ph_ twins)
# The other retrained single_expert/leave_one_out rows are omitted:
# plant 1 showed retraining heals capacity masks on this corpus, so
# they would only repeat r3's nulls at ~12 TPU-minutes each.
#
# Usage (from /root/repo, ambient axon env):
#   bash reports/ablation_r5_control/run_study.sh          # all (resumes)
#   bash reports/ablation_r5_control/run_study.sh 0-1      # one chunk
#   bash reports/ablation_r5_control/run_study.sh report   # re-report
set -euo pipefail
cd "$(dirname "$0")/../.."

CORPUS=/tmp/abl_corpus
if [ ! -f "$CORPUS/data.csv" ]; then
  python - <<'PYEOF'
from vivqa_tpu.data import ensure_synthetic_vivqa
csv, imgs = ensure_synthetic_vivqa("/tmp/abl_corpus", n=1024,
                                   image_size=64, seed=0, learnable=True)
print("corpus:", csv)
PYEOF
fi

case "${1:-}" in
  report)   EXP="--report-only" ;;
  "")       EXP="--experiments 0,1,3,5,7,9,11,13,14,15,16,17,19,21,23,25" ;;
  *)        EXP="--experiments $1" ;;
esac
exec python -m vivqa_tpu.ablation.run_ablation \
  --config reports/ablation_r5_control/study.yaml \
  --csv-path "$CORPUS/data.csv" --image-dir "$CORPUS/images" \
  --image-size 64 --train-ratio 0.7 --val-ratio 0.2 \
  --hidden-dim 64 --num-layers 2 --expert-hidden-dim 1024 \
  --specialized-experts 6 --vision-experts 0 --text-experts 0 \
  --multimodal-experts 0 \
  $EXP
