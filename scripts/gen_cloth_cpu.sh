#!/bin/bash
# CPU-side cloth episode generator: runs niced on the host CPU in parallel
# with the TPU campaigns (the sim is backend-agnostic JAX; episodes store
# positions + renders, so backend only affects wall-clock). Episodes land
# in the same dataset at base 601+; data_gen resume=True checkpoints after
# every stored push, so a deadline kill only loses the in-flight push.
set -u
cd /root/repo
LOG=/tmp/cpu_cloth_gen.log
WAIT_PID=${WAIT_PID:-}
DEADLINE=${DEADLINE:-0}   # epoch secs; stop starting new episodes after this
BASE=${BASE:-601}
N=${N:-12}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

for i in $(seq 0 $((N - 1))); do
  epi=$((BASE + i))
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[cpu-cloth] deadline; stop $(date)" >> "$LOG"
    break
  fi
  budget=$((DEADLINE - $(date +%s)))
  [ "$DEADLINE" -eq 0 ] && budget=10800
  echo "[cpu-cloth] episode $epi start $(date)" >> "$LOG"
  JAX_PLATFORMS=cpu nice -n 15 timeout "$budget" python - "$epi" <<'EOF' >> "$LOG" 2>&1
import sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
from adaptigraph_tpu.utils import enable_compile_cache, load_config
enable_compile_cache()
from adaptigraph_tpu.sim.data_gen import gen_episode
import time
epi = int(sys.argv[1])
config = load_config('data_gen/cloth')
t0 = time.time()
gen_episode(config, epi, True, 'data/sim_data')
print(f'[cpu-cloth] EPISODE {epi} done in {time.time()-t0:.0f}s', flush=True)
EOF
  echo "[cpu-cloth] episode $epi rc=$? $(date)" >> "$LOG"
done
echo "[cpu-cloth] ALL DONE $(date)" >> "$LOG"
