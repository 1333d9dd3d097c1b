#!/bin/bash
# Round-5 midday chain: after the region-only-mask oracle validates,
# (1) gate the v9 dither-heavy recognizer, (2) re-gate the dense-data
# detector retrain under the fixed mask, (3) measure u1d quality with
# whatever recognizer the gates left serving, (4) final dense probe.
#   nohup bash scripts/round5_chain.sh > /tmp/chain5.log 2>&1 &
cd "$(dirname "$0")/.."
set -x

# wait for any running check_quality to finish (the region-only oracle)
while pgrep -f "scripts/check_quality.py" > /dev/null; do sleep 30; done

python scripts/promote_checkpoint.py --kind recognizer \
  --stage model_zoo/trocr-fast3g2d6ovd2-stage \
  --target trocr-fast3g2d6ov-synth --eval-timeout 3600
echo "GATE_V9_RC=$?"

if [ -d model_zoo/craft-s2d2-dense-stage-rejected ]; then
  mv model_zoo/craft-s2d2-dense-stage-rejected model_zoo/craft-s2d2-dense-stage
fi
python scripts/promote_checkpoint.py --kind detector \
  --stage model_zoo/craft-s2d2-dense-stage \
  --target craft-s2d2-synth --eval-timeout 3600
echo "GATE_DENSE_RC=$?"

MARIE_UPLOAD_FORMAT=u1d timeout 2400 python scripts/check_quality.py \
  --pages 4 --decoders greedy > /tmp/oracle_u1d_final.json \
  2> /tmp/oracle_u1d_final.err
echo "U1D_RC=$?"

timeout 1200 python scripts/probe_dense.py --pages 4 > /tmp/dense_final.log 2>&1
echo "DENSE_PROBE_RC=$?"
echo "CHAIN5_DONE"
