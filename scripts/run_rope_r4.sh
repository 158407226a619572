#!/bin/bash
# Round-4 rope data campaign: batch-8 vmapped episodes (known-good path),
# resume-aware, bounded by DEADLINE. Complete = settle + n_timestep pushes
# (6 h5 files at the config's n_timestep=5).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/rope_r4.log
DEADLINE=${DEADLINE:?set DEADLINE epoch secs}

echo "[rope4] start $(date)" >> "$LOG"
bash scripts/tpu_watch.sh >> "$LOG" 2>&1

for base in 0 8 16 24 32 40 48 56 64 72 80 88 96; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && break
  done_n=0
  for i in $(seq 0 7); do
    d=$(printf 'data/sim_data/rope/%06d' $((base + i)))
    [ "$(ls "$d" 2>/dev/null | grep -c '\.h5$')" -ge 6 ] && done_n=$((done_n + 1))
  done
  if [ "$done_n" -eq 8 ]; then
    echo "[rope4] base $base already complete $(date)" >> "$LOG"
    continue
  fi
  echo "[rope4] batch base $base start $(date)" >> "$LOG"
  timeout 4200 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/rope --n-episode 8 --batch 8 \
    --base "$base" --out data/sim_data >> /tmp/rope_batch_r4.log 2>&1
  echo "[rope4] batch base $base rc=$? $(date)" >> "$LOG"
  bash scripts/tpu_watch.sh >> "$LOG" 2>&1
done
echo "[rope4] DONE $(date)" >> "$LOG"
