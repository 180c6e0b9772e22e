#!/bin/bash
# Round-4 TPU evidence queue (run AFTER bench.py finishes — one process
# per tunnel):
#  1. quality_800 at 50k steps with the super-sampling A/B at 320^3
#     (VERDICT r3 items 5+6 in one training: every published SSIM becomes
#     post-f32-fix, and the un-stubbed --super-sampling gets a measured
#     chamfer/wall table on a well-trained field).
#  2. surface-ray exporter evidence (2k-step field, 32 x 800^2 views,
#     chamfer + one-sided accuracy vs the analytic surface).
# Run with: nohup bash scripts/r4b_tpu_queue.sh > logs/r4b_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "R4B_QUEUE_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
# 50k train (~14 min) + ~15-18 min GT-render/compile startup + 480^3 mesh
# + 6 super-sampled 320^3 extractions (ss=2 evaluates 3 dense 320^2x959
# grids -> tunnel-transfer heavy): give it a wide budget.
timeout 9000 python scripts/quality_800.py --steps 50000 --ss-ab 320 \
  --out quality_800_50k.json > logs/r4b_quality800_50k.log 2>&1 || exit 1
timeout 3600 python scripts/r4_surface_ray_evidence.py \
  > logs/r4b_surface_ray.log 2>&1 || exit 1
#  3. Blender file-contract run: hard scene written as
#     transforms_{split}.json + PNGs, trained + evaluated through the
#     REAL CLI chain via data/loaders/blender.py (the reference's
#     flagship pipeline shape; companion to the r3 LLFF/NDC evidence).
timeout 1200 python scripts/make_blender_scene.py \
  > logs/r4b_make_blender.log 2>&1 || exit 1
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf \
  --config configs/hard-blender.yml --run-name r4_blender \
  > logs/r4b_train_blender.log 2>&1 || exit 1
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/hard-blender/r4_blender/version_0 \
  --save-dir logs/r4b_eval_blender --save-images \
  > logs/r4b_eval_blender.log 2>&1 || exit 1
echo R4B_QUEUE_DONE
