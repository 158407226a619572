#!/bin/bash
# Cloth data campaign: batch-4 vmapped episodes (known-good on the remote
# worker; batch-8 crashes it — CLAUDE.md). One watchdog per batch; a
# healthy 4-episode cloth batch (settle + 5 push rounds at ~370 s/round)
# is mostly host-idle, so the stall window must exceed the longest idle
# stretch; timeout(1) bounds the worst case.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/cloth_campaign.log
STALL_MIN=${STALL_MIN:-28}

ticks() {
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

run_watched() {
  "$@" &
  local pid=$!
  local last=0 still=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now
    now=$(ticks "$pid")
    if [ "$now" -le "$((last + 30))" ]; then
      still=$((still + 1))
    else
      still=0
    fi
    last=$now
    if [ "$still" -ge "$STALL_MIN" ]; then
      echo "[watchdog] pid $pid stalled ${STALL_MIN}m; killing" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 9
    fi
  done
  wait "$pid"
}

# retry granular episodes left settle-only by the 32k contact-overflow bug
# (fixed in engine/solver.py: auto tile_j=256 above 16k rows) — bounded so
# cloth still gets its window
if [ "${GRAN_RETRY:-1}" = "1" ]; then
  retried=0
  for d in data/sim_data/granular/0003*; do
    [ -d "$d" ] || continue
    have=$(ls "$d" | grep -c '\.h5$')
    if [ "$have" -le 1 ] && [ "$retried" -lt 4 ]; then
      epi=$((10#$(basename "$d")))
      echo "[cloth-pre] retry settle-only granular $epi $(date)" >> "$LOG"
      timeout 1500 python scripts/gen_granular_seq.py "$epi" 1 \
        >> /tmp/gran_seq.log 2>&1
      retried=$((retried + 1))
    fi
  done
fi

# smoke the new shaded-mesh cloth render path on the real chip before
# committing the campaign window to it; on any failure fall back to the
# r2 surfel-splat renderer (ADAPTIGRAPH_CLOTH_MESH=0) so a Mosaic/memory
# surprise cannot sink the cloth data window
echo "[cloth] mesh-render smoke $(date)" >> "$LOG"
if run_watched timeout 900 python scripts/smoke_cloth_mesh_tpu.py \
     >> /tmp/cloth_mesh_smoke.log 2>&1; then
  echo "[cloth] mesh render OK $(date)" >> "$LOG"
else
  echo "[cloth] mesh render smoke FAILED; falling back to splats $(date)" >> "$LOG"
  export ADAPTIGRAPH_CLOTH_MESH=0
  bash scripts/tpu_watch.sh >> "$LOG" 2>&1
fi

N=${CLOTH_N:-8}
BATCH=4
base=${CLOTH_BASE:-420}
first=1
for lo in $(seq "$base" "$BATCH" $((base + N - 1))); do
  echo "[cloth] batch base $lo start $(date)" >> "$LOG"
  run_watched timeout 4500 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/cloth --n-episode "$BATCH" --batch "$BATCH" \
    --base "$lo" --out data/sim_data >> /tmp/cloth_batch.log 2>&1
  rc=$?
  echo "[cloth] batch base $lo rc=$rc $(date)" >> "$LOG"
  if [ "$first" = 1 ] && [ "$rc" -ne 0 ] && \
     [ "${ADAPTIGRAPH_CLOTH_MESH:-1}" != "0" ]; then
    # single-env smoke passed but the vmapped batch program may still be
    # the straw that breaks the remote worker — drop to splats and retry
    # this batch once (episodes resume from their checkpoints)
    echo "[cloth] first batch failed; retrying with splat renderer $(date)" >> "$LOG"
    export ADAPTIGRAPH_CLOTH_MESH=0
    bash scripts/tpu_watch.sh >> "$LOG" 2>&1
    run_watched timeout 4500 python -m adaptigraph_tpu.sim.batch_env \
      --config data_gen/cloth --n-episode "$BATCH" --batch "$BATCH" \
      --base "$lo" --out data/sim_data >> /tmp/cloth_batch.log 2>&1
    echo "[cloth] splat retry base $lo rc=$? $(date)" >> "$LOG"
  fi
  first=0
  bash scripts/tpu_watch.sh >> "$LOG" 2>&1
done
echo "[cloth] DONE $(date)" >> "$LOG"
