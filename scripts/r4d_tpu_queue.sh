#!/bin/bash
# Round-4 queue, part 3: recreate the BuFF 250k flagship (the r3
# checkpoint died with the logs/ workspace reset) and re-measure the
# masked-vs-raw chamfer sweep at the FINAL mask semantics on a CONVERGED
# field — the measurement r3 planned and lost (CLAUDE.md gotcha). Also
# re-evals the flagship PSNR through the eval CLI and runs the 480^3
# masked production extraction.
# Run with: nohup bash scripts/r4d_tpu_queue.sh > logs/r4d_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "R4D_QUEUE_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
timeout 8400 python -m nerfmeshes_tpu.cli.train_nerf \
  --config configs/buff-hard-250k.yml --run-name r4_buff250k \
  > logs/r4d_train_buff250k.log 2>&1 || exit 1
VDIR=$(ls -d logs/buff-hard-250k/r4_buff250k/version_* | sort -t_ -k2 -n | tail -1)
timeout 1800 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint "$VDIR" --save-dir logs/r4d_eval_buff250k --save-images \
  > logs/r4d_eval_buff250k.log 2>&1 || exit 1
timeout 1800 python scripts/iso_sweep.py --log-checkpoint "$VDIR" \
  --isos 10 20 30 40 50 --out iso_buff250k_mask_final.json \
  > logs/r4d_iso_masked.log 2>&1 || exit 1
timeout 1800 python scripts/iso_sweep.py --log-checkpoint "$VDIR" \
  --isos 10 20 30 40 50 --no-tree-mask --out iso_buff250k_raw_final.json \
  > logs/r4d_iso_raw.log 2>&1 || exit 1
timeout 1800 python -m nerfmeshes_tpu.cli.mesh_nerf \
  --log-checkpoint "$VDIR" --save-dir logs/r4d_mesh_buff250k \
  --res 480 --iso-level 20 \
  > logs/r4d_mesh480.log 2>&1 || exit 1
echo R4D_QUEUE_DONE
