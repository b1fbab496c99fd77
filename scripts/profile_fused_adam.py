"""Measure the fused clip+Adam+apply lever end-to-end (VERDICT r3 item 7).

TenAnt+MAPPO full train_iter at bench scale, optimizer = optax chain vs
FusedClipAdam (one tree traversal, no materialized rescaled-grad/updates
trees), timed with the trusted device-side-scan harness.  Accept if it
clears ~215k env-steps/s; otherwise record the rejection with numbers in
BASELINE.md (like the r1 fused-tower and r3 overlap/bf16-mu entries).

  python scripts/profile_fused_adam.py            # TPU
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.utils.profiling import measure_rtt, time_scanned


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    algo = os.environ.get("MARL_ALGO", "mappo")
    env = TenAntEnv({})
    rtt = measure_rtt()
    print(f"algo={algo} E={E} rtt={rtt*1e3:.1f}ms", flush=True)
    results = {}
    for opt in ("adam", "fused_adam"):
        cfg = MarlConfig(algorithm_name=algo, optimizer=opt)
        runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
        ts = runner.init_state()
        it = runner._make_train_iter()
        dt = time_scanned(lambda t: it(t)[0], ts, n=10, rtt=rtt)
        sps = cfg.episode_length * E / dt
        results[opt] = (dt, sps)
        print(f"{opt:11s}  {dt*1e3:8.2f} ms/iter  -> {sps:,.0f} env-steps/s",
              flush=True)
        del runner, ts, it
    base, fused = results["adam"][0], results["fused_adam"][0]
    print(f"delta: {1e3*(base - fused):+.2f} ms ({100*(base-fused)/base:+.2f}%)")


if __name__ == "__main__":
    main()
