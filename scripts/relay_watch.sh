#!/bin/bash
# Watch the TPU tunnel relay port; when it comes alive, run the pending
# TPU evidence queue (scripts/r4_tpu_queue.sh) exactly once.
# The relay can be dead for hours (see CLAUDE.md); probing is the only
# safe check — any jax call against a dead relay hangs forever.
cd /root/repo
mkdir -p logs
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "$(date -Is) RELAY_ALIVE — launching r4 TPU queue" | tee -a logs/relay_watch.log
    bash scripts/r4_tpu_queue.sh >> logs/r4_queue.log 2>&1
    echo "$(date -Is) queue exited rc=$?" | tee -a logs/relay_watch.log
    exit 0
  fi
  echo "$(date -Is) relay dead" >> logs/relay_watch.log
  sleep 120
done
