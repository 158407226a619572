#!/bin/bash
# Granular data campaign with a hang watchdog. Batch-4 vmapped granular
# PUSH programs hang the remote TPU worker (CLAUDE.md); batch-2 is probed
# once — if its first push round completes we keep batch-2 for throughput,
# else we fall back to the known-good single-env sequential generator.
# Hang detection: the stuck worker burns ~0 CPU ticks, so we sample
# /proc/PID/stat and kill after STALL_MIN minutes without progress.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/gran_campaign.log
STALL_MIN=${STALL_MIN:-12}

ticks() {  # utime+stime of pid $1 (0 if gone)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

run_watched() {  # run "$@" with a stall watchdog; rc 0 ok, 9 = killed-stalled
  "$@" &
  local pid=$!
  local last=0 still=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now
    now=$(ticks "$pid")
    if [ "$now" -le "$((last + 30))" ]; then  # <30 ticks (~0.3 s CPU) in 1 min
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

if [ "${GRAN_SEQ_ONLY:-0}" = "1" ]; then
  # skip the batch probe: batch-2 granular push programs hang the remote
  # worker just like batch-4 (probed+killed once; recovery costs ~5 min)
  rc=1
else
  echo "[gran] batch-2 probe start $(date)" >> "$LOG"
  run_watched timeout 4800 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/granular --n-episode 2 --batch 2 \
    --base 320 --out data/sim_data >> /tmp/gran_probe.log 2>&1
  rc=$?
  echo "[gran] batch-2 probe rc=$rc $(date)" >> "$LOG"
fi

if [ "$rc" -eq 0 ]; then
  echo "[gran] batch-2 works; campaign at batch 2 $(date)" >> "$LOG"
  run_watched timeout 14400 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/granular --n-episode "${GRAN_N:-14}" --batch 2 \
    --base 330 --out data/sim_data >> /tmp/gran_batch.log 2>&1
  echo "[gran] batch campaign rc=$? $(date)" >> "$LOG"
else
  echo "[gran] falling back to sequential $(date)" >> "$LOG"
  bash scripts/tpu_watch.sh >> "$LOG" 2>&1
  # sequential episodes, one watchdog per episode. A HEALTHY granular
  # episode is mostly host-idle (remote compiles + on-device pushes), so
  # the stall window must exceed a full episode's idle stretch — 12 min
  # killed a live episode mid-push; the real hang signature is ~0 ticks
  # for 25+ min (CLAUDE.md), and `timeout` still bounds the worst case.
  # Episodes checkpoint full scene state after every stored push
  # (data_gen resume=True), so a watchdog kill only loses the in-flight
  # push — retry the SAME episode and it resumes where it stopped. A
  # healthy process ticks steadily (each 40-frame chunk dispatch returns
  # to host); 15 min of ~0 ticks is definitively a hung device call.
  STALL_MIN=${STALL_MIN_SEQ:-15}
  base=${GRAN_BASE:-330}
  deadline=${GRAN_DEADLINE:-0}  # epoch secs; 0 = no deadline
  want=$(( $(python -c "
from adaptigraph_tpu.utils import load_config
print(int(load_config('data_gen/granular')['dataset']['n_timestep']))") + 1 ))
  for i in $(seq 0 $(( ${GRAN_N:-14} - 1 ))); do
    if [ "$deadline" -gt 0 ] && [ "$(date +%s)" -ge "$deadline" ]; then
      echo "[gran] deadline reached; stopping campaign $(date)" >> "$LOG"
      break
    fi
    epi=$((base + i))
    dir=$(printf 'data/sim_data/granular/%06d' "$epi")
    for attempt in 1 2 3; do
      have=$(ls "$dir" 2>/dev/null | grep -c '\.h5$')
      [ "$have" -ge "$want" ] && break
      run_watched timeout 2700 python scripts/gen_granular_seq.py "$epi" 1 \
        >> /tmp/gran_seq.log 2>&1
      rc=$?
      echo "[gran] seq episode $epi attempt $attempt rc=$rc $(date)" >> "$LOG"
      # the generator exits 0 even after internal failures; completeness is
      # the h5 count checked at the top of the next attempt
      [ "$rc" -ne 0 ] && bash scripts/tpu_watch.sh >> "$LOG" 2>&1
    done
  done
fi
echo "[gran] DONE $(date)" >> "$LOG"
