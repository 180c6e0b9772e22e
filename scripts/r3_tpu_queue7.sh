#!/bin/bash
# Round-3 queue 7: re-measure flagship eval SSIM after pinning the SSIM
# blur convs to f32 (TPU bf16 conv default inflated SSIM past 1.0), for
# the BASELINE.md rows of both 250k runs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

timeout 2400 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/hard-250k/r3_250k/version_0 --checkpoint last \
  --save-dir logs/r3_eval_250k_ssimfix \
  > logs/r3_eval_250k_ssimfix.log 2>&1

timeout 2400 python -m nerfmeshes_tpu.cli.eval_nerf \
  --log-checkpoint logs/buff-hard-250k/r3_buff250k/version_0 --checkpoint last \
  --save-dir logs/r3_eval_buff250k_ssimfix \
  > logs/r3_eval_buff250k_ssimfix.log 2>&1

echo QUEUE7_DONE
