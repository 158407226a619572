#!/bin/bash
# Round-4 session-4 granular campaign: sequential single-env episodes
# (batch-N granular PUSH programs hang the remote worker — CLAUDE.md),
# SMALL PARTICLE BUCKETS FIRST. Bucket size sets episode wall time
# (4k/8k ~3-6 min, 16k ~8-15 min, 32k up to ~45), so a bucket-sorted
# seed queue maximizes episodes/hour; the queue still spans the full
# sampler distribution of granular_scale/friction (bucket correlates
# with num_granular x blob size, not with the physics label alone).
# Seeds pre-scanned host-side via scenes.build probe (see gen_granular_seq
# scene_bucket_n). Usage: DEADLINE=<epoch> run_granular_r4s4.sh [seedfile]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/gran_campaign_s4.log
DEADLINE=${DEADLINE:?set DEADLINE epoch secs}
SEEDFILE=${1:-/tmp/gran_seeds_s4.txt}

echo "[gran4] start $(date); deadline $(date -d @$DEADLINE)" >> "$LOG"
while read -r seed; do
  [ -z "$seed" ] && continue
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "[gran4] deadline $(date)" >> "$LOG"; break; }
  d=$(printf 'data/sim_data/granular/%06d' "$seed")
  if [ "$(ls "$d" 2>/dev/null | grep -c '\.h5$')" -ge 6 ]; then
    echo "[gran4] seed $seed already complete" >> "$LOG"
    continue
  fi
  echo "[gran4] seed $seed start $(date)" >> "$LOG"
  timeout 2400 python scripts/gen_granular_seq.py "$seed" 1 \
    >> /tmp/gran_seq_s4.log 2>&1
  rc=$?
  echo "[gran4] seed $seed rc=$rc $(date)" >> "$LOG"
  if [ "$rc" -ne 0 ]; then
    bash scripts/tpu_watch.sh >> "$LOG" 2>&1
  fi
done < "$SEEDFILE"
echo "[gran4] DONE $(date)" >> "$LOG"
