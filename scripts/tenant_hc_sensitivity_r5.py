"""TenAnt+MAPPO learning sensitivity to the impact-regime contact difference
(VERDICT r4 next item 5b).

The r4/r5 MuJoCo cross-validation shows our Hunt-Crossley contact transfers
~23% more box displacement per hard (4 m/s) impact than MuJoCo's solver,
while quasi-static agreement is sub-cm.  This script trains TenAnt+MAPPO
under contact-constant variants spanning the impact-response envelope so
curves across it can be compared - if they are statistically
indistinguishable, the impact-regime difference is benign for the
benchmark.

r5 sweep OUTCOME (results/impact_sweep_r5.json + impact_sweep2_r5.json):
NO contact constant reaches MuJoCo's -0.239 m - the vx=-4 box displacement
is structurally insensitive (range -0.279 [k=4e5] .. -0.380 [mdv=0.5]
across a 4x stiffness range, mdv 0.5-4, kd/2, HC caps).  The study
therefore trains under the ENVELOPE EXTREMES: a response band (-0.279 ..
-0.380, a 36% spread) wider than the ours-vs-MuJoCo gap (23%).

  SEED=1 VARIANT=default python scripts/tenant_hc_sensitivity_r5.py
  SEED=1 VARIANT=stiff   python scripts/tenant_hc_sensitivity_r5.py  # k=4e5: dx -0.279
  SEED=1 VARIANT=soft    python scripts/tenant_hc_sensitivity_r5.py  # mdv=0.5: dx -0.380

Writes results/tenant_hc_r5_<variant>_s<seed>.json (episode-return curve).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.ten_ant import TenAntEnv


def main():
    E = int(os.environ.get("SENS_NUM_ENVS", 128))
    iters = int(os.environ.get("SENS_ITERS", 8000))
    seed = int(os.environ.get("SEED", 1))
    variant = os.environ.get("VARIANT", "default")
    contact = {"default": {},
               # vx=-4 box dx -0.2793 (closest to MuJoCo's -0.2387)
               "stiff": {"stiffness": 4e5, "damping": 1265.0},
               # vx=-4 box dx -0.3797 (far end of the envelope)
               "soft": {"max_depen_vel": 0.5}}[variant]
    sim = {} if not contact else {"contact": contact}
    env = TenAntEnv({"sim": sim})
    runner = MarlRunner(env, num_envs=E, cfg=MarlConfig(algorithm_name="mappo"),
                        seed=seed, print_log=False)
    ts = runner.init_state()
    rows, t0 = [], time.time()
    for i in range(iters):
        ts, m = runner._train_iter(ts)
        if i % 40 == 0 or i == iters - 1:
            rew = float(m["mean_reward"])
            ep = float(ts.last_ep_ret.mean())
            rows.append((i, rew, ep))
            if i % 400 == 0 or i == iters - 1:
                print(f"[{variant}-s{seed}] it {i}: rew/step {rew:.2f} "
                      f"ep_ret {ep:.1f} ({time.time()-t0:.0f}s)", flush=True)
    eps = np.array([r[2] for r in rows])
    n = len(eps)
    summary = dict(variant=variant, contact=contact, seed=seed, E=E, iters=iters,
                   ep_first=float(eps[0]), ep_median=float(np.median(eps)),
                   ep_last_quarter=float(np.mean(eps[3 * n // 4:])),
                   ep_max=float(eps.max()), curve=rows)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", f"tenant_hc_r5_{variant}_s{seed}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
