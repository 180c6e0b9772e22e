#!/bin/bash
# Round-3 queue 9: re-measure the BuFF 250k masked chamfer under the
# FINAL support-mask semantics (support/holes split: enclosed interiors
# read SOLID fill, outside-connected non-support reads EMPTY, clamp
# stats over support cells, out-of-grid AABBs skipped). Compare against
# iso_buff250k_masked.json (old semantics).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# The tunnel relay can be dead (r3): every jax call would hang forever.
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "QUEUE9_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint logs/buff-hard-250k/r3_buff250k/version_0 \
  --isos 10 20 30 40 50 --out iso_buff250k_masked_v2.json \
  > logs/r3_iso_buff250k_v2.log 2>&1
echo QUEUE9_DONE
