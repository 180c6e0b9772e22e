#!/bin/bash
# Round-3 queue 4: BuFF-vs-hierarchical seed-spread study. The single-seed
# comparable sweep (buff_sweep_slab.json) flipped the r2 blobs ordering and
# was non-monotone in the cap (45.2 / 42.9 / 45.8 vs hierarchical 47.4) —
# at >45 dB the trajectories are seed-chaotic, so the match-or-beat claim
# needs the spread across seeds.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 7200 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --caps 1536 4096 8192 --seeds 42 0 1 --out buff_sweep_seeds.json \
  > logs/r3_buff_seeds.log 2>&1

echo QUEUE4_DONE
