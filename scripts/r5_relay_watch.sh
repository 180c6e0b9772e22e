#!/bin/bash
# Watch the TPU tunnel relay port; when it comes alive, run the pending
# r5 TPU queue exactly once (see scripts/r5_tpu_queue.sh).
cd /root/repo
mkdir -p logs
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "$(date -Is) RELAY_ALIVE — launching r5 TPU queue" | tee -a logs/relay_watch.log
    bash scripts/r5_tpu_queue.sh >> logs/r5_queue.log 2>&1
    echo "$(date -Is) r5 queue exited rc=$?" | tee -a logs/relay_watch.log
    exit 0
  fi
  echo "$(date -Is) relay dead" >> logs/relay_watch.log
  sleep 120
done
