"""Long-horizon TenAnt+MAPPO under the SHIPPED r4 defaults
(friction_combine=average): the r3 34M-step no-collapse result was measured
under the old 'multiply' rule; this validates horizon stability under the
new default at bench scale.

  python scripts/val_mappo_long_r4.py     # TPU; LONG_ITERS=1000 (32.8M steps)
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
    E = int(os.environ.get("LONG_NUM_ENVS", 4096))
    iters = int(os.environ.get("LONG_ITERS", 1000))
    env = TenAntEnv({})
    runner = MarlRunner(env, num_envs=E, cfg=MarlConfig(algorithm_name="mappo"),
                        seed=1, print_log=False)
    ts = runner.init_state()
    rows = []
    t0 = time.time()
    for i in range(iters):
        ts, m = runner._train_iter(ts)
        if i % 20 == 0 or i == iters - 1:
            # one stacked fetch per log point (host-fetch discipline)
            rew = float(m["mean_reward"])
            ep = float(ts.last_ep_ret.mean())
            rows.append((i, (i + 1) * 8 * E, rew, ep))
            print(f"[mappo-long-avg] it {i} ({(i+1)*8*E/1e6:.1f}M steps): "
                  f"rew/step {rew:.2f} ep_ret {ep:.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    eps = [r[3] for r in rows]
    n = len(eps)
    summary = dict(E=E, iters=iters, steps=iters * 8 * E,
                   ep_first=eps[0], ep_median=float(np.median(eps)),
                   ep_last_quarter=float(np.mean(eps[3 * n // 4:])),
                   ep_max=max(eps), curve=rows)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "results", "mappo_long_r4_average.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
