"""OneAnt+PPO peak-attribution probe, r5 (VERDICT r4 next item 3b/3c).

r4 established: under the shipped friction_combine='average', OneAnt+PPO
peaks at 3.0-4.6 (vs 11.55 under 'multiply' and the reference seed1's 10.65
transient), and ground traction is NOT the driver (plane-mu probe).  The
inferred mechanism was the ant-box PAIR (mu 0.375 under average vs 0 under
multiply) - but the CONFIRMING experiment was never run.

This is it: 'average' combine everywhere EXCEPT the ant-box pair forced to
mu=0 (sim.ant_box_friction=0, the one pair 'multiply' zeroes).  If the
peak returns to the ~10-11 multiply-mode band, the attribution is proven.

  SEED=1 ANT_BOX_MU=0.0 python scripts/oneant_probe_r5.py
  SEED=1 python scripts/oneant_probe_r5.py          # shipped average (control)

Writes results/oneant_probe_r5_<tag>_s<seed>.json with the full curve.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.one_ant import OneAntEnv


def main():
    E = int(os.environ.get("PROBE_NUM_ENVS", 128))
    iters = int(os.environ.get("PROBE_ITERS", 6500))
    seed = int(os.environ.get("SEED", 1))
    abm = os.environ.get("ANT_BOX_MU", "")
    bgm = os.environ.get("BOX_GROUND_MU", "")
    mode = os.environ.get("COMBINE", "average")
    sim = {"friction_combine": mode}
    tag = "avg" if mode == "average" else mode
    if abm != "":
        sim["ant_box_friction"] = float(abm)
        tag = f"antbox{float(abm):g}"
    if bgm != "":
        # second-round probe: the ant-box mu=0 runs did NOT restore the
        # multiply-band peak, so test the remaining pair difference -
        # box-ground (0.5 average vs 0 multiply: glide vs pinned box)
        sim["box_ground_friction"] = float(bgm)
        tag += f"_boxgnd{float(bgm):g}" if abm != "" else f"boxgnd{float(bgm):g}"
    env = OneAntEnv({"sim": sim})
    ppo = PPO(env, num_envs=E, cfg=PPOConfig(), seed=seed, print_log=False)
    ts = ppo.init_state()
    rews, t0 = [], time.time()
    for i in range(iters):
        ts, m = ppo._train_iter(ts)
        if i % 25 == 0 or i == iters - 1:
            rews.append((i, float(m["mean_reward"])))
            if i % 250 == 0 or i == iters - 1:
                print(f"[oneant-{tag}-s{seed}] it {i}: rew/step "
                      f"{rews[-1][1]:.3f} ({time.time()-t0:.0f}s)", flush=True)
    vals = np.array([r[1] for r in rews])
    summary = dict(tag=tag, seed=seed, E=E, iters=iters,
                   first=float(vals[0]), median=float(np.median(vals)),
                   last=float(vals[-1]), max=float(vals.max()),
                   curve=rews)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", f"oneant_probe_r5_{tag}_s{seed}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
