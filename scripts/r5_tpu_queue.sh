#!/bin/bash
# r5 pending TPU evidence (run once when the relay returns):
#   1. kernel-off convergence diag — fused-MLP numerics A/B at the exact
#      convergence_check workload (fine-vs-coarse investigation)
#   2. 6k-step diag — does fine cross coarse with budget on that workload?
#   3. 12k-step diag — only if someone reads 6k and wants the tail; cheap
#      enough to just run.
# Each leg in its own process (tunnel-wedge protocol); logs under logs/.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
python scripts/r5_conv_diag.py 1e-3 2000 0 > logs/r5_diag_nofused.log 2>&1
python scripts/r5_conv_diag.py 1e-3 6000 > logs/r5_diag_6k.log 2>&1
python scripts/r5_conv_diag.py 1e-3 12000 > logs/r5_diag_12k.log 2>&1
echo "r5 TPU queue done rc=$?"
