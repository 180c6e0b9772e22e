#!/bin/bash
# Round-3 TPU evidence queue — run AFTER the 250k training completes.
# One TPU process at a time (tunnel constraint). Continue on error.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
RUN=logs/hard-250k/r3_250k/version_0

# 1. eval CLI on the last checkpoint (5 x 800^2 held-out test views)
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf --log-checkpoint $RUN \
  --save-dir logs/r3_eval_250k --save-images --save-disparity \
  > logs/r3_eval_250k.log 2>&1

# 2. mesh CLI 480^3 from the last checkpoint (timings + iso diagnostics)
timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf --log-checkpoint $RUN \
  --res 480 --iso-level 30 --save-dir logs/r3_mesh_250k --mesh-name mesh.ply \
  > logs/r3_mesh_250k.log 2>&1

# 3. iso sweeps (chamfer-inversion diagnosis): final checkpoint, the
# preserved mid-run snapshot (re-registered for the manager), and a
# fresh 20k-step 800^2 run reproducing the r2 early data point.
timeout 2400 python scripts/iso_sweep.py --log-checkpoint $RUN --checkpoint last \
  --res 320 --out iso_sweep_250k.json > logs/r3_iso_250k.log 2>&1
cp -r $RUN/ckpt_125000_snapshot $RUN/checkpoints/125000 2>/dev/null
timeout 2400 python scripts/iso_sweep.py --log-checkpoint $RUN --checkpoint 125000 \
  --res 320 --out iso_sweep_125k.json > logs/r3_iso_125k.log 2>&1
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf --config configs/hard-synthetic-250k.yml \
  --run-name r3_20k --override experiment.train_iters 20000 experiment.id hard-20k \
  > logs/r3_20k_train.log 2>&1
timeout 2400 python scripts/iso_sweep.py --log-checkpoint logs/hard-20k/r3_20k/version_0 \
  --checkpoint last --res 320 --out iso_sweep_20k.json > logs/r3_iso_20k.log 2>&1

# 4. NDC at scale: generate the LLFF scene, train 20k, eval
timeout 1200 python scripts/make_llff_scene.py --out data/hard_llff --size 400 --n 24 \
  > logs/r3_llff_gen.log 2>&1
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf --config configs/hard-llff.yml \
  --run-name r3_ndc > logs/r3_llff_train.log 2>&1
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/hard-llff/r3_ndc/version_0 \
  --save-dir logs/r3_eval_ndc --save-images > logs/r3_eval_ndc.log 2>&1

# 5. slab-vs-monolithic perf probe at V=4096 (decides _SLAB_V default)
timeout 3600 python scripts/probe_slab_perf.py --voxels 4096 > logs/r3_slab_probe.log 2>&1

# 6. voxel-cap sweep past the old compile wall (slab path): 4096 + 8192
timeout 5400 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --caps 4096 8192 --skip-hierarchical --out buff_sweep_slab.json > logs/r3_buff_sweep.log 2>&1

echo QUEUE_DONE
