#!/bin/bash
# Round-4 chain, part 4: open-vocab recognizer v6 — after the crop
# squeeze-on-overflow fix (mono gt-box CER 0.012 -> 0.000 on the v5
# checkpoint without retraining) and the bold letter-spacing recipe,
# retrain the GQA-2 d6 preset and gate it.
#   nohup bash scripts/round4_chain4.sh > /tmp/chain4d.log 2>&1 &
cd "$(dirname "$0")/.."
set -x

python scripts/train_recognizer.py --preset fast3g2d6 --steps 48000 \
  --batch-size 128 --rotate-deg 2 --text-mode open \
  --font-sizes 14,18,20,24,30 --bold-p 0.35 --shear-p 0.15 \
  --out model_zoo/trocr-fast3g2d6ov-stage
echo "TRAIN_D6V6_RC=$?"

python scripts/promote_checkpoint.py --kind recognizer \
  --stage model_zoo/trocr-fast3g2d6ov-stage --target trocr-fast3g2d6ov-synth \
  --require-eval --pages 3 --eval-timeout 3600
echo "GATE_D6V6_RC=$?"
