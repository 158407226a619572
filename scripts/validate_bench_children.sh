#!/bin/bash
# Validate each bench.py child entry point directly on the chip (they are
# exactly what the driver's bench spawns) and warm the persistent compile
# cache for the round-end capture. Deadline-bounded; each phase logs a
# result line or its failure.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/bench_children.log}
DEADLINE=${DEADLINE:-$(( $(date +%s) + 1500 ))}

run() {
  NOW=$(date +%s); left=$((DEADLINE - NOW))
  if [ "$left" -lt 120 ]; then echo "[val] skip $* (deadline)" >> $LOG; return; fi
  [ "$left" -gt 600 ] && left=600
  echo "[val] $* (budget ${left}s) $(date +%H:%M:%S)" >> $LOG
  timeout "$left" python bench.py "$@" >> $LOG 2>&1
  echo "[val] rc=$? $(date +%H:%M:%S)" >> $LOG
}

run --gnn slotmm f32
run --gnn slotmm bf16
run --gnn slotted f32
run --gnn matmul f32
run --mppi slotmm f32
run --pbd-batch block
echo "[val] DONE $(date +%H:%M:%S)" >> $LOG
