"""Assemble the planning acceptance artifact from whatever a (possibly
timeout-killed) plan_acceptance.py run left behind.

plan() saves stats.txt incrementally per executed action and ppo_*.npz per
PPO refit; plan_acceptance.py dumps the episode's KNOWN normalized physics
parameter to true_param.json before planning starts. This script merges the
three into data/plan_{material}/acceptance.json with the same two checks the
full script applies (error decreases; PPO estimate recovers the known
param — the sim analogue of the reference's demo number,
/root/reference/README.md:246-258). The emitted schema matches
plan_acceptance.py's (plus n_actions_executed), so a consumer of
acceptance.json never needs to know which script produced it (ADVICE r3 #5).

Usage: plan_accept_eval.py [material]
"""
import glob
import json
import os
import re
import sys

import numpy as np

MATERIAL = sys.argv[1] if len(sys.argv) > 1 else "rope"
SAVE = f"/root/repo/data/plan_{MATERIAL}"


def ppo_index(path):
    return int(re.search(r"ppo_(\d+)", os.path.basename(path)).group(1))


tp_path = os.path.join(SAVE, "true_param.json")
meta = json.load(open(tp_path)) if os.path.exists(tp_path) else {}
true_param = np.atleast_1d(meta.get("true_param", []))

# a run killed before the first executed action leaves no/empty stats.txt —
# still emit the artifact with whatever true_param/ppo evidence exists
# (ADVICE r3 #2)
stats_path = os.path.join(SAVE, "stats.txt")
errors = np.zeros((0,))
if os.path.exists(stats_path) and os.path.getsize(stats_path) > 0:
    stats = np.atleast_2d(np.loadtxt(stats_path))
    if stats.size:
        errors = stats[:, 2]

# numeric sort: lexicographic glob order puts ppo_10 before ppo_2
# (ADVICE r3 #1)
ppo_files = sorted(glob.glob(os.path.join(SAVE, "ppo_*.npz")), key=ppo_index)
est = np.load(ppo_files[-1])["physics_param"] if ppo_files else None

res = {
    "material": MATERIAL,
    "n_actions": meta.get("n_actions"),
    "n_actions_executed": int(len(errors)),
    "n_sample": meta.get("n_sample"),
    "errors": [round(float(e), 4) for e in errors],
}
if len(errors) >= 2:
    window_n = max(2, len(errors) // 3)
    early = float(errors[:window_n].mean())
    late = float(errors[-window_n:].mean())
    res.update(early_mean=round(early, 4), late_mean=round(late, 4),
               error_decreased=bool(late < early and errors[-1] < errors[0]))
if true_param.size:
    res["true_param"] = [round(float(x), 4) for x in true_param]
res["ppo_estimate"] = ([round(float(x), 4) for x in np.atleast_1d(est)]
                       if est is not None else None)
if est is not None and true_param.size:
    est = np.atleast_1d(est)
    gap = float(np.abs(est - true_param).max())
    prior_gap = float(np.abs(0.5 - true_param).max())
    res["ppo_abs_gap"] = round(gap, 4)
    res["prior_abs_gap"] = round(prior_gap, 4)
    res["ppo_recovered"] = bool(gap <= max(0.15, prior_gap))
print(json.dumps(res))
os.makedirs(SAVE, exist_ok=True)
with open(os.path.join(SAVE, "acceptance.json"), "w") as f:
    json.dump(res, f, indent=1)
