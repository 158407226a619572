"""Sequential single-env granular episodes (the batch-4 vmapped granular
push program hangs the remote TPU worker — see CLAUDE.md; single-env
programs are known-good). Usage: gen_granular_seq.py [base] [n]."""
import sys
import time

sys.path.insert(0, "/root/repo")
from adaptigraph_tpu.utils import enable_compile_cache, load_config
from adaptigraph_tpu.sim.data_gen import gen_episode

enable_compile_cache()  # watchdog restarts skip the multi-minute recompiles

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 310
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8

def scene_bucket_n(seed):
    """Host-side (numpy-only) probe of the seed's padded particle bucket."""
    import numpy as np

    from adaptigraph_tpu.scenes import build_scene
    from adaptigraph_tpu.scenes.build import MATERIAL_CAPS, bucket_caps

    caps = MATERIAL_CAPS["granular"]
    probe = build_scene("granular", np.random.RandomState(seed), caps=caps)
    cl = probe.spec.clusters
    return bucket_caps(probe.n_active, int(np.asarray(cl.valid).sum()),
                       int(np.asarray(cl.member_valid).sum(1).max()), caps).n


for seed in range(BASE, BASE + N):
    t0 = time.time()
    cfg = load_config("data_gen/granular")
    cfg["dataset"]["screenWidth"] = 360
    cfg["dataset"]["screenHeight"] = 360
    cfg["dataset"]["robot_speed_inv"] = 150
    # large-bucket PUSH programs occasionally wedge the remote worker
    # (CLAUDE.md; probabilistic — 16k episodes do complete). The probe lets
    # a campaign cap its exposure via GRAN_MAX_BUCKET; default is attempt
    # everything (watchdog+timeout+resume bound the damage).
    import os as _os

    max_bucket = int(_os.environ.get("GRAN_MAX_BUCKET", "0"))
    if max_bucket:
        bn = scene_bucket_n(seed)
        if bn > max_bucket:
            print(f"EPISODE {seed} SKIPPED: bucket n={bn} > "
                  f"GRAN_MAX_BUCKET={max_bucket}", flush=True)
            continue
    try:
        gen_episode(cfg, seed, True, "/root/repo/data/sim_data", resume=True)
        print(f"EPISODE {seed} done in {time.time()-t0:.0f}s", flush=True)
    except Exception:
        import traceback

        traceback.print_exc()
        print(f"EPISODE {seed} FAILED after {time.time()-t0:.0f}s; "
              "waiting for worker recovery", flush=True)
        time.sleep(120)
print("ALL DONE", flush=True)
