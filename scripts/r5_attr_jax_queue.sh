#!/bin/bash
# Sequential jax-stack runs for the r5 blobs attribution study (TPU).
# One run per process (tunnel compiler can wedge); each completed run is
# appended to r5_blobs_attribution.json, so a retry loses at most one run.
# Runs concurrently with scripts/r5_attr_torch_queue.sh (nice'd torch):
# contention halves host dispatch throughput but the study is quality-only.
# Run with: nohup bash scripts/r5_attr_jax_queue.sh > logs/r5_attr_jax.log 2>&1 &
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "R5_ATTR_JAX_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
for seed in 42 0 1; do
  for system in buff hier; do
    key="jax_${system}_${seed}"
    if python - "$key" <<'EOF'
import json, sys
from pathlib import Path
p = Path("r5_blobs_attribution.json")
data = json.loads(p.read_text()) if p.exists() else {}
sys.exit(0 if sys.argv[1] in data else 1)
EOF
    then
      echo "skip $key (done)"
      continue
    fi
    for attempt in 1 2; do
      echo "=== $key attempt $attempt $(date +%H:%M:%S) ==="
      if timeout 3000 python scripts/r5_blobs_attribution.py \
           --run jax "$system" "$seed" --platform tpu 2>&1 | tail -8; then
        break
      fi
      echo "retry $key (timeout/wedge)"
    done
  done
done
echo "R5_ATTR_JAX_DONE $(date +%H:%M:%S)"
