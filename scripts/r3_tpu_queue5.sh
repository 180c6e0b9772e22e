#!/bin/bash
# Round-3 queue 5: the BuFF flagship — full 250k-iteration workload on the
# hard scene at 800^2 (iteration parity with the reference's
# buff-synthetic-lego.yml), then the eval + mesh CLI chain from its
# checkpoint. Companion to the hierarchical 250k row in BASELINE.md.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Hard-scene match-or-beat under the FIXED eval protocol (the r2 study
# predates fixed_views): BuFF at lr 1e-3 (its stable regime) vs
# hierarchical at both its collapsing (1e-3) and stable (5e-4) lr.
timeout 7200 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --scene hard --lr 1e-3 --caps 1536 4096 --seeds 42 0 1 \
  --out buff_sweep_hard_seeds.json > logs/r3_buff_hard_seeds.log 2>&1
timeout 3600 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --scene hard --lr 5e-4 --caps 0 --seeds 42 0 1 \
  --out buff_sweep_hard_hier5e4.json > logs/r3_buff_hard_hier.log 2>&1

timeout 10800 python -m nerfmeshes_tpu.cli.train_nerf \
  --config configs/buff-hard-250k.yml --run-name r3_buff250k \
  > logs/r3_buff250k_train.log 2>&1

RUN="$(ls -d logs/buff-hard-250k/r3_buff250k/version_* | tail -1)"

timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint "$RUN" --checkpoint last \
  --save-dir logs/r3_eval_buff250k --save-images \
  > logs/r3_eval_buff250k.log 2>&1

timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint "$RUN" --res 480 --iso-level 30 \
  --save-dir logs/r3_mesh_buff250k --mesh-name mesh.ply \
  > logs/r3_mesh_buff250k.log 2>&1

echo QUEUE5_DONE
