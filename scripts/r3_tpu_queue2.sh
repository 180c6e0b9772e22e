#!/bin/bash
# Round-3 queue 2: items that wedged in queue 1 + comparable sweep + bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
RUN=logs/hard-250k/r3_250k/version_0

# 1. mesh CLI 480^3 retry
timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf --log-checkpoint $RUN \
  --res 480 --iso-level 30 --save-dir logs/r3_mesh_250k --mesh-name mesh.ply \
  > logs/r3_mesh_250k.log 2>&1

# 2. NDC pipeline retry
timeout 1200 python scripts/make_llff_scene.py --out data/hard_llff --size 400 --n 24 \
  > logs/r3_llff_gen.log 2>&1
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf --config configs/hard-llff.yml \
  --run-name r3_ndc > logs/r3_llff_train.log 2>&1
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint "$(ls -d logs/hard-llff/r3_ndc/version_* | tail -1)" \
  --save-dir logs/r3_eval_ndc --save-images > logs/r3_eval_ndc.log 2>&1

# 3. 20k early point retry + iso sweep
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf --config configs/hard-synthetic-250k.yml \
  --run-name r3_20k --override experiment.train_iters 20000 experiment.id hard-20k \
  > logs/r3_20k_train.log 2>&1
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint "$(ls -d logs/hard-20k/r3_20k/version_* | tail -1)" \
  --checkpoint last --res 320 --out iso_sweep_20k.json > logs/r3_iso_20k.log 2>&1

# 4. comparable voxel-cap sweep (fixed val views, all caps + hierarchical bar)
timeout 7200 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --caps 1536 4096 8192 --out buff_sweep_slab.json > logs/r3_buff_sweep2.log 2>&1

# 5. slab-vs-monolithic probe with fixed readback timing
timeout 3600 python scripts/probe_slab_perf.py --voxels 4096 > logs/r3_slab_probe.log 2>&1

# 6. final bench
timeout 3600 python bench.py > logs/r3_bench.log 2>&1

echo QUEUE2_DONE
