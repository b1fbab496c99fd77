"""Round-2 TPU validation campaign.

Runs on the real TPU (axon default backend):
  1. TenAnt+PPO headline throughput (bench.py methodology) after the
     round-2 physics overhaul (normalized joint axes, implicit contacts,
     implicit limit damping, sensor torques)
  2. DR throughput: --randomize must now ride the fused kernel
     (VERDICT r1 item 3: within ~2x of the non-DR number, not 20x)
  3. TenAnt+MAPPO with PopArt (the reference's exercised normalizer):
     short learning run, curve must rise comparably to the ValueNorm baseline
  4. episode-faithful eval sanity on the trained state

Writes one JSON line per stage to /tmp/val_r2/results.jsonl.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/val_r2"
os.makedirs(OUT, exist_ok=True)
RESULTS = os.path.join(OUT, "results.jsonl")


def emit(rec):
    rec["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def stage_bench(randomize: bool, num_envs=4096, reports=3):
    import yaml
    from massive_marl_tpu.utils.config import CFG_ROOT
    from massive_marl_tpu.utils.registry import build_env

    with open(os.path.join(CFG_ROOT, "TenAnt.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["env"]["numEnvs"] = num_envs
    if randomize:
        cfg.setdefault("task", {})["randomize"] = True
    env = build_env("TenAnt", cfg, multi_agent=False)
    key = jax.random.PRNGKey(0)
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, num_envs))
    act_dim = env.num_actions * env.num_agents
    steps = 256

    def chunk(st, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, act_dim), minval=-1.0, maxval=1.0)
            s = env.step_batch(s, a)
            return (s, k), None
        (st, key), _ = jax.lax.scan(body, (st, key), None, length=steps)
        return st, key

    chunk = jax.jit(chunk, donate_argnums=(0,))
    t0 = time.time()
    st, key = chunk(st, key)
    jax.block_until_ready(st.obs)
    emit({"stage": f"bench_compile randomize={randomize}", "secs": time.time() - t0})
    best = 0.0
    for i in range(reports):
        t0 = time.perf_counter()
        st, key = chunk(st, key)
        jax.block_until_ready(st.obs)
        dt = time.perf_counter() - t0
        rate = num_envs * steps / dt
        best = max(best, rate)
        emit({"stage": f"bench randomize={randomize}", "report": i,
              "env_steps_per_s": rate})
    return best


def stage_mappo(iters=150, num_envs=2048):
    import yaml
    from massive_marl_tpu.utils.config import CFG_ROOT
    from massive_marl_tpu.utils.registry import build_env
    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner

    with open(os.path.join(CFG_ROOT, "TenAnt.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["env"]["numEnvs"] = num_envs
    env = build_env("TenAnt", cfg, multi_agent=True)
    with open(os.path.join(CFG_ROOT, "mappo", "config.yaml")) as f:
        cfg_train = yaml.safe_load(f)
    mc = MarlConfig.from_cfg_train(cfg_train, "mappo")
    assert mc.norm_mode() == "popart", mc.norm_mode()
    runner = MarlRunner(env, num_envs=num_envs, cfg=mc, seed=0, print_log=False)
    ts = runner.init_state()
    t0 = time.time()
    ts, metrics = runner._train_iter(ts)
    jax.block_until_ready(ts.actor_params)
    emit({"stage": "mappo_compile", "secs": time.time() - t0})
    rews = []
    t0 = time.time()
    for it in range(iters):
        ts, metrics = runner._train_iter(ts)
        if it % 25 == 0 or it == iters - 1:
            r = float(metrics["mean_reward"])
            rews.append(r)
            emit({"stage": "mappo_popart", "it": it, "rew_per_step": r,
                  "vloss": float(metrics["value_loss"])})
    dt = time.time() - t0
    emit({"stage": "mappo_popart_done", "iters": iters,
          "env_steps_per_s": iters * mc.episode_length * num_envs / dt,
          "rew_first": rews[0], "rew_last": rews[-1]})
    runner.state = ts
    ev = runner.eval(n_episodes=32)
    emit({"stage": "mappo_eval_episode_return", "value": ev})
    return rews


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bench"):
        base = stage_bench(randomize=False)
        dr = stage_bench(randomize=True)
        emit({"stage": "dr_ratio", "base": base, "dr": dr,
              "ratio": base / max(dr, 1.0)})
    if which in ("all", "mappo"):
        stage_mappo()
    emit({"stage": "done"})
