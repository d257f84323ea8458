#!/usr/bin/env bash
# Round-3 specialized-expert ablation study (VERDICT r2 #2).
#
# Trains 9 experiments (full / no_moe / 6x leave-one-out over the six
# specialized experts / soft-router swap) on the LEARNABLE synthetic
# corpus (image content encodes the answers) and writes the manifest +
# per-experiment metrics under reports/ablation_r3/runs/. Resumable:
# re-running skips completed experiments (the runner's manifest), so the
# study fits the <10-min TPU chunks — pass an --experiments range to
# bound a chunk explicitly.
#
# Usage (from /root/repo, ambient axon env):
#   bash reports/ablation_r3/run_study.sh            # all (resumes)
#   bash reports/ablation_r3/run_study.sh 0-2        # one chunk
#   bash reports/ablation_r3/run_study.sh backfill   # masks from ckpts
#   bash reports/ablation_r3/run_study.sh report     # re-report only
set -euo pipefail
cd "$(dirname "$0")/../.."

CORPUS=/tmp/abl_corpus
if [ ! -f "$CORPUS/data.csv" ]; then
  python - <<'EOF'
from vivqa_tpu.data import generate_synthetic_vivqa
csv, imgs = generate_synthetic_vivqa("/tmp/abl_corpus", n=1024,
                                     image_size=64, seed=0, learnable=True)
print("corpus:", csv)
EOF
fi

case "${1:-}" in
  backfill) EXP="--backfill-masks" ;;
  report)   EXP="--report-only" ;;
  "")       EXP="" ;;
  *)        EXP="--experiments $1" ;;
esac
exec python -m vivqa_tpu.ablation.run_ablation \
  --config reports/ablation_r3/study.yaml \
  --csv-path "$CORPUS/data.csv" --image-dir "$CORPUS/images" \
  --image-size 64 --train-ratio 0.7 --val-ratio 0.2 \
  --specialized-experts 6 --vision-experts 0 --text-experts 0 \
  --multimodal-experts 0 \
  $EXP
