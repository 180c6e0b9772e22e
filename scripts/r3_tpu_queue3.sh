#!/bin/bash
# Round-3 queue 3: post-fix evidence.
#  - NDC re-eval: the focal=1.0 val/eval ray bug made the r3_ndc run eval
#    at 5.4 dB; the checkpoint itself trained through the CORRECT in-step
#    NDC path, so re-evaluating with the fixed image_rays gives the real
#    forward-facing number.
#  - Mesh CLI re-run at the 250k checkpoint with the instrumented transfer
#    phase split (the 133.6s grid_transfer anomaly) + the iso-10 optimum.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/hard-llff/r3_ndc/version_1 --checkpoint last \
  --save-dir logs/r3_eval_ndc_fixed --save-images \
  > logs/r3_eval_ndc_fixed.log 2>&1

timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint logs/hard-250k/r3_250k/version_0 \
  --res 480 --iso-level 30 --save-dir logs/r3_mesh_250k_phase --mesh-name mesh30.ply \
  > logs/r3_mesh_250k_phase.log 2>&1

timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint logs/hard-250k/r3_250k/version_0 \
  --res 480 --iso-level 10 --save-dir logs/r3_mesh_250k_phase --mesh-name mesh10.ply \
  > logs/r3_mesh_250k_iso10.log 2>&1

# 20k-checkpoint iso sweep (the queue2 glob missed: the experiment.id
# override didn't move the run dir before the resolve_paths fix — the run
# actually lives under hard-250k/r3_20k).
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint logs/hard-250k/r3_20k/version_1 \
  --checkpoint last --res 320 --out iso_sweep_20k.json \
  > logs/r3_iso_20k.log 2>&1

echo QUEUE3_DONE
