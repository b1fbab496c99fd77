"""Measured sensitivity of the TenAnt benchmark to the friction-combine rule
(VERDICT r3 missing item 1 / next-round item 1b).

Question: the reference zeroes the box SHAPE material friction
(ten_ant.py:548-550) and ships plane mu=1.0 (TenAnt.yaml:55-56); PhysX's
default combine mode is eAVERAGE, so the reference sim's pair frictions are
box-ground ~0.5, ant-box ~0.75, ant-ground ~1.25 - whereas this repo's
historical 'multiply' rule gives 0 / 0 / 1.5.  Does that difference matter
for the benchmark's central object (the 28-mass box) and for learning?

  push  - deterministic multi-ant shove: all 10 ants launched at the box
          side with identical initial velocity; box displacement/velocity
          trajectories under each combine mode.  Runs anywhere (CPU fine).
  learn - TenAnt+MAPPO learning curves (E, iters configurable) under each
          mode.  Run on the TPU.

Usage:
  JAX_PLATFORMS=cpu python scripts/friction_sensitivity.py push
  python scripts/friction_sensitivity.py learn   # TPU; SENS_ITERS=300 etc.

Results recorded in BASELINE.md (r4 friction-combine study).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


MODES = ("multiply", "average")


def scenario_push(mode: str, steps: int = 180, vx: float = -3.0):
    """All 10 ants fly into the 1x28x1 box's +x face with identical initial
    velocity; zero torques afterwards.  Deterministic: no reset noise, states
    constructed directly.  Returns the box COM x(t), |v_x|(t)."""
    from massive_marl_tpu.envs.ant_scene import AntSceneState, scene_step
    from massive_marl_tpu.envs.ten_ant import TenAntEnv

    env = TenAntEnv({"sim": {"fused_kernel": False,
                             "friction_combine": mode}})
    spec = env.spec
    sys_ = spec.ant_sys
    A = spec.num_ants
    # ants in a row along y at x=6 (their spawn line), box face at x=4.5
    qpos = jax.vmap(lambda y: sys_.init_qpos(jnp.array([6.0, y, 0.6])))(
        jnp.linspace(-12.0, 12.0, A))
    qvel = jnp.zeros((A, sys_.nv)).at[:, 0].set(vx)
    st = AntSceneState(
        ant_qpos=qpos, ant_qvel=qvel,
        box_qpos=jnp.array([4.0, 0.0, 0.5, 0.0, 0.0, 0.0, 1.0]),
        box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((A, max(sys_.num_sensors, 1), 6)))
    step = jax.jit(lambda s: scene_step(spec, s, jnp.zeros((A, sys_.nj))))
    xs, vxs = [], []
    for _ in range(steps):
        st = step(st)
        xs.append(float(st.box_qpos[0]))
        vxs.append(float(st.box_qvel[0]))
    return np.asarray(xs), np.asarray(vxs)


def run_push():
    out = {}
    for mode in MODES:
        t0 = time.time()
        xs, vxs = scenario_push(mode)
        dt = 0.0166
        out[mode] = dict(
            x_final=float(xs[-1]), dx=float(xs[-1] - 4.0),
            vx_peak=float(vxs.min()),  # most-negative = fastest push
            vx_final=float(vxs[-1]),
            x_at=[float(xs[i]) for i in (29, 59, 119, 179)],
        )
        print(f"[push {mode:9s}] box dx {out[mode]['dx']:+.3f} m  "
              f"peak vx {out[mode]['vx_peak']:+.3f}  final vx "
              f"{out[mode]['vx_final']:+.3f}  ({time.time()-t0:.0f}s)", flush=True)
    print(json.dumps({"experiment": "friction_push", **out}))
    return out


def run_learn():
    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
    from massive_marl_tpu.envs.ten_ant import TenAntEnv

    E = int(os.environ.get("SENS_NUM_ENVS", 128))
    iters = int(os.environ.get("SENS_ITERS", 400))
    seed = int(os.environ.get("SENS_SEED", 1))
    out = {}
    for mode in MODES:
        env = TenAntEnv({"sim": {"friction_combine": mode}})
        runner = MarlRunner(env, num_envs=E,
                            cfg=MarlConfig(algorithm_name="mappo"),
                            seed=seed, print_log=False)
        ts = runner.init_state()
        rews = []
        t0 = time.time()
        for i in range(iters):
            ts, m = runner._train_iter(ts)
            if i % 10 == 0 or i == iters - 1:
                rews.append((i, float(m["mean_reward"])))
                print(f"[learn {mode:9s}] it {i}: rew/step {rews[-1][1]:.2f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        out[mode] = dict(first=rews[0][1], last=rews[-1][1],
                         max=max(r for _, r in rews), curve=rews)
    print(json.dumps({"experiment": "friction_learn", "E": E, "iters": iters,
                      **{m: {k: v for k, v in d.items() if k != "curve"}
                         for m, d in out.items()}}))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "results", "friction_learn.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("curves ->", path)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "push"
    if which in ("push", "all"):
        run_push()
    if which in ("learn", "all"):
        run_learn()
