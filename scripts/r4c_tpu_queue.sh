#!/bin/bash
# Round-4 TPU evidence queue, part 2 — the legs r4b aborted before
# (its surface-ray leg trained at the schema-default lr 5e-3 and the
# fine net collapsed; fixed in r4_surface_ray_evidence.py, which now
# defaults to the stable 5e-4 and fails loudly on empty exports).
# Run with: nohup bash scripts/r4c_tpu_queue.sh > logs/r4c_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "R4C_QUEUE_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
timeout 3600 python scripts/r4_surface_ray_evidence.py \
  > logs/r4c_surface_ray.log 2>&1 || exit 1
timeout 1200 python scripts/make_blender_scene.py \
  > logs/r4c_make_blender.log 2>&1 || exit 1
timeout 3600 python -m nerfmeshes_tpu.cli.train_nerf \
  --config configs/hard-blender.yml --run-name r4_blender \
  > logs/r4c_train_blender.log 2>&1 || exit 1
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/hard-blender/r4_blender/version_0 \
  --save-dir logs/r4c_eval_blender --save-images \
  > logs/r4c_eval_blender.log 2>&1 || exit 1
echo R4C_QUEUE_DONE
