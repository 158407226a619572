#!/bin/bash
# Round-3 data campaign: granular then cloth (the two data-deficient
# materials), batch-4 vmapped envs, crash-tolerant (batch_env skips failed
# batches and waits for TPU worker recovery). Run under setsid+nohup so it
# survives the builder session.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[campaign] granular start $(date)" >> /tmp/campaign_r3.log
timeout 10800 python -m adaptigraph_tpu.sim.batch_env \
  --config data_gen/granular --n-episode "${GRAN_N:-16}" --batch 4 \
  --base 300 --out data/sim_data >> /tmp/campaign_gran.log 2>&1
echo "[campaign] granular done rc=$? $(date)" >> /tmp/campaign_r3.log

echo "[campaign] cloth start $(date)" >> /tmp/campaign_r3.log
timeout 10800 python -m adaptigraph_tpu.sim.batch_env \
  --config data_gen/cloth --n-episode "${CLOTH_N:-16}" --batch 4 \
  --base 400 --out data/sim_data >> /tmp/campaign_cloth.log 2>&1
echo "[campaign] cloth done rc=$? $(date)" >> /tmp/campaign_r3.log
