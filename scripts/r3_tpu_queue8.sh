#!/bin/bash
# Round-3 queue 8: chamfer the BuFF 250k checkpoint's geometry against the
# analytic hard-scene surface (cross-system geometry evidence), after the
# NDC SSIM re-eval frees the TPU.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint logs/buff-hard-250k/r3_buff250k/version_0 \
  --isos 10 30 --out iso_buff250k.json > logs/r3_iso_buff250k.log 2>&1
echo QUEUE8_DONE
