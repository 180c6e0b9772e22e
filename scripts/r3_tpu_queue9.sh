#!/bin/bash
# Round-3 queue 9: re-measure the BuFF 250k masked chamfer under the
# FIXED support-mask semantics (hole-filled keep + out-of-grid AABB skip
# + masked clamp stats). Compare against iso_buff250k_masked.json (old
# semantics): hole filling removes the block-face skin behind the
# surface; out-of-grid skip closes boundary keep-holes.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint logs/buff-hard-250k/r3_buff250k/version_0 \
  --isos 10 20 30 40 50 --out iso_buff250k_masked_v2.json \
  > logs/r3_iso_buff250k_v2.log 2>&1
echo QUEUE9_DONE
