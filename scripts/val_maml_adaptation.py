"""MAML on the real OneAnt heading meta-task: train, then measure pre- vs
post-adaptation query return on held-out task headings (VERDICT r3 item 6).

  python scripts/val_maml_adaptation.py          # TPU; MAML_ITERS=150 etc.

Records the adaptation gap that is MAML's entire claim; results go to
BASELINE.md r4 and results/maml_adaptation.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from massive_marl_tpu.algos.metarl.maml import MAMLConfig, MAMLPPO
from massive_marl_tpu.envs.one_ant import OneAntEnv


def main():
    iters = int(os.environ.get("MAML_ITERS", 150))
    E = int(os.environ.get("MAML_NUM_ENVS", 64))
    cfg = MAMLConfig(support_steps=32, query_steps=32, meta_batch_size=4,
                     adapt_steps=1, inner_lr=float(os.environ.get("MAML_ILR", 0.05)))
    env = OneAntEnv({})
    t = MAMLPPO(env, num_envs=E, cfg=cfg, seed=1, print_log=False)
    t.state = t.init_state()
    pre0, post0 = t.eval_adaptation(n_tasks=8)
    print(f"[maml-ant] init: pre {pre0:+.4f} post {post0:+.4f} "
          f"gap {post0-pre0:+.4f}", flush=True)
    t0 = time.time()
    curve = []
    for i in range(iters):
        t.state, m = t._meta_iter(t.state)
        if i % 10 == 0 or i == iters - 1:
            curve.append((i, float(m["meta_loss"]), float(m["mean_reward"])))
            print(f"[maml-ant] it {i}: loss {curve[-1][1]:.1f} "
                  f"rew {curve[-1][2]:+.3f} ({time.time()-t0:.0f}s)", flush=True)
    pre, post = t.eval_adaptation(n_tasks=8)
    print(f"[maml-ant] after {iters} meta-iters: pre {pre:+.4f} "
          f"post {post:+.4f} gap {post-pre:+.4f}")
    out = dict(init=dict(pre=pre0, post=post0),
               trained=dict(pre=pre, post=post, iters=iters),
               curve=curve, E=E,
               cfg=dict(support=cfg.support_steps, query=cfg.query_steps,
                        meta_batch=cfg.meta_batch_size,
                        inner_lr=cfg.inner_lr))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "results", "maml_adaptation.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
