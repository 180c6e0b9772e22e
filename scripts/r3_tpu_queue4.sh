#!/bin/bash
# Round-3 queue 4: BuFF-vs-hierarchical seed-spread study. The single-seed
# comparable sweep (buff_sweep_slab.json) flipped the r2 blobs ordering and
# was non-monotone in the cap (45.2 / 42.9 / 45.8 vs hierarchical 47.4) —
# at >45 dB the trajectories are seed-chaotic, so the match-or-beat claim
# needs the spread across seeds.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Forward-facing NDC retrain with the focal + [0,1]-bounds fixes (the
# r3_ndc run trained with scene-depth bounds along NDC rays — memorized
# train views, 10.4 dB eval). Full CLI chain at 400^2.
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf --config configs/hard-llff.yml \
  --run-name r3_ndc_fixed > logs/r3_llff_train2.log 2>&1
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint "$(ls -d logs/hard-llff/r3_ndc_fixed/version_* | tail -1)" \
  --checkpoint last --save-dir logs/r3_eval_ndc2 --save-images \
  > logs/r3_eval_ndc2.log 2>&1

timeout 7200 python scripts/buff_sweep.py --steps 12000 --size 96 \
  --caps 1536 4096 8192 --seeds 42 0 1 --out buff_sweep_seeds.json \
  > logs/r3_buff_seeds.log 2>&1

# A/B the slab-scan tree ops against the monolithic path at cap 4096 with
# the same seed: NERFMESHES_SLAB_V=4096 keeps V=4096 on the monolithic
# einsum (r2's configuration, which scored 48.2 under the old protocol).
NERFMESHES_SLAB_V=4096 timeout 1800 python scripts/buff_sweep.py \
  --steps 12000 --size 96 --caps 4096 --seeds 42 --skip-hierarchical \
  --out buff_sweep_monolithic_ab.json > logs/r3_buff_mono_ab.log 2>&1

echo QUEUE4_DONE
