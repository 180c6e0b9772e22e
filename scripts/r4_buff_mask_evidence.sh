#!/bin/bash
# Masked-chamfer v2 evidence on a FRESH BuFF checkpoint.
#
# The r3 flagship checkpoint (logs/buff-hard-250k) did not survive the
# workspace reset (logs/ is gitignored), so the final support-mask
# semantics (solid-fill holes, out-of-grid AABB skip, support-only clamp
# stats) are re-measured on a short fresh run: 12k steps at 400^2,
# V=4096, short-run consolidation cadence so the tree refines.
# Output: iso_buff_mask_v2.json (masked) + iso_buff_mask_v2_raw.json.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
RUN=logs/buff-mask-v2
timeout 1800 python -m nerfmeshes_tpu.cli.train_nerf \
  --config configs/buff-hard-250k.yml --run-name mask_v2 \
  --override experiment.logdir "$RUN" experiment.train_iters 12000 \
    experiment.validate_every 6000 dataset.synthetic.image_size 400 \
    tree.step_size_integration_offset 500 tree.step_size_tree 2000 \
  > logs/r4_buff_mask_train.log 2>&1 || exit 1
# Numeric sort: version_10 sorts lexically BEFORE version_9 (ADVICE r3).
VDIR=$(ls -d "$RUN"/*/mask_v2/version_* | sort -t_ -k2 -n | tail -1)
timeout 1200 python scripts/iso_sweep.py --log-checkpoint "$VDIR" \
  --isos 10 20 30 40 50 --out iso_buff_mask_v2.json \
  > logs/r4_iso_mask_v2.log 2>&1 || exit 1
timeout 1200 python scripts/iso_sweep.py --log-checkpoint "$VDIR" \
  --isos 10 20 30 40 50 --no-tree-mask --out iso_buff_mask_v2_raw.json \
  > logs/r4_iso_mask_v2_raw.log 2>&1 || exit 1
echo BUFF_MASK_EVIDENCE_DONE
