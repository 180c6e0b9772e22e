#!/bin/bash
# COMPLETED (r4 session, 2026-08-18): items 1+3 ran clean (quality_800
# post-fix SSIM 0.9615, bench 124,615 rays/s); item 2's checkpoint did
# not survive the workspace reset (logs/ is gitignored) — replaced by
# scripts/r4_buff_mask_evidence.sh on a fresh checkpoint. Do NOT re-run.
#
# Pending TPU evidence (relay died mid-r3 before these completed):
#  1. quality_800 re-run post SSIM f32-conv fix (pre-fix rows carry a
#     +-0.003-ish SSIM bias — BASELINE.md flags them).
#  2. Masked chamfer re-measure under the FINAL support-mask semantics
#     (solid-fill holes) -> iso_buff250k_masked_v2.json.
#  3. bench.py for a fresh headline number.
# Run with: nohup bash scripts/r4_tpu_queue.sh > logs/r4_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "R4_QUEUE_ABORT: relay port 8082 refuses connections" >&2
  exit 1
fi
mkdir -p logs
# quality_800 alone is ~15-18 min of GT-render+compile startup plus 383s
# training plus eval + 480^3 mesh + chamfer — give it a real budget.
timeout 4800 python scripts/quality_800.py > logs/r4_quality800.log 2>&1
timeout 2400 python scripts/iso_sweep.py \
  --log-checkpoint logs/buff-hard-250k/r3_buff250k/version_0 \
  --isos 10 20 30 40 50 --out iso_buff250k_masked_v2.json \
  > logs/r4_iso_masked_v2.log 2>&1
# bench.py's internal watchdog is 2 attempts x 900s; the outer bound must
# cover both attempts plus cold start or it kills the retry mid-flight.
timeout 2400 python bench.py > logs/r4_bench.log 2>&1
echo R4_QUEUE_DONE
