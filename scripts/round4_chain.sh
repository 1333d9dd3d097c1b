#!/bin/bash
# Round-4 TPU work chain — one TPU process at a time, each step logged.
# Run AFTER the v4 open-vocab training finishes:
#   nohup bash scripts/round4_chain.sh > /tmp/chain4.log 2>&1 &
cd "$(dirname "$0")/.."
set -x

# 1. gate the v4 open-vocab fast2 candidate into its ladder slot
python scripts/promote_checkpoint.py --kind recognizer \
  --stage model_zoo/trocr-fast2ov-stage --target trocr-fast2ov-synth \
  --require-eval --pages 3 --eval-timeout 3600
echo "GATE_FAST2OV_RC=$?"

# 2. GQA-2 recognizer (3x smaller cross-KV = the decode HBM floor),
#    same open-vocab recipe
python scripts/train_recognizer.py --preset fast3g2 --steps 48000 \
  --batch-size 128 --rotate-deg 2 --text-mode open \
  --font-sizes 14,18,20,24,30 --bold-p 0.3 --shear-p 0.15 \
  --out model_zoo/trocr-fast3g2ov-stage
echo "TRAIN_G2_RC=$?"

# 3. gate it (ladder A/B: fast3g2ov slot sits above fast2ov/fast2)
python scripts/promote_checkpoint.py --kind recognizer \
  --stage model_zoo/trocr-fast3g2ov-stage --target trocr-fast3g2ov-synth \
  --require-eval --pages 3 --eval-timeout 3600
echo "GATE_G2_RC=$?"

# 4. device-efficiency probes: CC stats variants + AOT zoo load
python scripts/probe_cc.py
echo "PROBE_RC=$?"
