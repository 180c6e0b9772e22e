#!/bin/bash
# Round-3 queue 6: evidence chain off the 250k BuFF flagship run
# (configs/buff-hard-250k.yml, VERDICT item 2's BuFF half). Waits for the
# training PID, then: eval CLI at 800^2 -> mesh CLI at 480^3 (demo iso 30
# and the r3 quality pick iso 10) -> bench.py regression check after the
# maybe_shard refactor.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

TRAIN_PID="$1"
if [ -n "$TRAIN_PID" ]; then
  while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
fi

RUN="$(ls -d logs/buff-hard-250k/r3_buff250k/version_* | tail -1)"

timeout 2400 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint "$RUN" --checkpoint last \
  --save-dir logs/r3_eval_buff250k --save-images \
  > logs/r3_eval_buff250k.log 2>&1

timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint "$RUN" --checkpoint last --res 480 \
  --save-dir logs/r3_mesh_buff250k \
  > logs/r3_mesh_buff250k.log 2>&1

timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint "$RUN" --checkpoint last --res 480 --iso-level 10 \
  --save-dir logs/r3_mesh_buff250k_iso10 \
  > logs/r3_mesh_buff250k_iso10.log 2>&1

timeout 2400 python bench.py > logs/r3_bench_post_refactor.log 2>&1

echo QUEUE6_DONE
