#!/bin/bash
# Sequential torch-reference runs for the r5 blobs attribution study.
# Each run is its own process and appends to r5_blobs_attribution.json,
# so a crash/retry loses at most one run. Run niced so concurrent TPU
# dispatch (the jax legs) isn't starved on this 1-vCPU host.
cd /root/repo
for seed in 42 0 1; do
  for system in buff hier; do
    key="torch_${system}_${seed}"
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
    echo "=== $key $(date +%H:%M:%S) ==="
    nice -n 10 timeout 14400 python scripts/r5_blobs_attribution.py \
      --run torch "$system" "$seed" 2>&1 | tail -5
  done
done
echo "torch queue done $(date +%H:%M:%S)"
