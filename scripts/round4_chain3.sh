#!/bin/bash
# Round-4 chain, part 3: dense-layout detector retrain (the oracle's
# ood_dense row measured detection recall 0.718 — merges/misses on
# tight two-column pages the trainer never rendered), then gate it.
#   nohup bash scripts/round4_chain3.sh > /tmp/chain4c.log 2>&1 &
cd "$(dirname "$0")/.."
set -x

python scripts/train_craft.py --preset fast_s2d2 --steps 6000 \
  --out model_zoo/craft-s2d2d-stage
echo "TRAIN_CRAFT_RC=$?"

python scripts/promote_checkpoint.py --kind detector \
  --stage model_zoo/craft-s2d2d-stage --target craft-s2d2-synth \
  --pages 3 --eval-timeout 3600
echo "GATE_CRAFT_RC=$?"
