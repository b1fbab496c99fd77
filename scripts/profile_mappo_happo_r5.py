"""r5: explain/close the MAPPO-vs-HAPPO throughput inversion (VERDICT r4
weak item 1 / next item 2).

BENCH_r04: tenant_mappo 195.5k vs tenant_happo 208.9k env-steps/s although
HAPPO does strictly MORE work (sequential factor chain + old/new logp
passes).  Hypothesis: the stacked [N,B] joint update pays for the batch
transposes (vmap(agent_batch_core): [T,E,N,...] -> [N,T*E,...]) and the
broadcast [N,B,share] critic input, while HAPPO's per-agent path keeps the
batch axis leading and slices.

Measures, at bench shapes (E=4096, T=8, N=10), with the trusted
device-side-scan harness:
  - full train iteration for: mappo(sequential) [new default],
    mappo(stacked) [r1-r4 behavior], happo
  - rollout/update phase split for each
  - epoch scaling: the same three at ppo_epoch=1 (a constant update-time
    gap = prep-bound, a scaling gap = kernel-bound)

Run on the TPU:  python scripts/profile_mappo_happo_r5.py
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.utils.profiling import measure_rtt, time_scanned


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    env = TenAntEnv({"sim": {"fused_kernel": True}})
    rtt = measure_rtt()
    out = {"E": E, "rtt_ms": round(rtt * 1e3, 1)}
    variants = [
        ("mappo_seq", dict(algorithm_name="mappo", update_schedule="sequential")),
        ("mappo_stacked", dict(algorithm_name="mappo", update_schedule="stacked")),
        ("happo", dict(algorithm_name="happo")),
    ]
    for epochs in (5, 1):
        for name, kw in variants:
            cfg = MarlConfig(ppo_epoch=epochs, **kw)
            runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0,
                                print_log=False)
            ts = runner.init_state()
            it = runner._make_train_iter()
            tag = f"{name}_e{epochs}"
            dt_full = time_scanned(lambda t: it(t)[0], ts, n=10, rtt=rtt)
            out[f"{tag}_iter_ms"] = round(dt_full * 1e3, 2)
            out[f"{tag}_env_steps_per_sec"] = round(
                cfg.episode_length * E / dt_full, 1)
            try:
                roll = it.rollout_phase
                es0, k0, traj0 = jax.jit(roll)(ts)

                def roll_carry(c):
                    es, k = c
                    es2, k2, _ = roll(ts.replace(env_state=es, key=k))
                    return (es2, k2)

                dt_r = time_scanned(roll_carry, (ts.env_state, ts.key),
                                    n=10, rtt=rtt)
                upd = it.update_phase
                dt_u = time_scanned(lambda t: upd(t, es0, k0, traj0)[0], ts,
                                    n=10, rtt=rtt)
                out[f"{tag}_rollout_ms"] = round(dt_r * 1e3, 2)
                out[f"{tag}_update_ms"] = round(dt_u * 1e3, 2)
            except Exception as e:  # noqa: BLE001
                out[f"{tag}_phase_error"] = f"{type(e).__name__}: {e}"
            print(f"{tag}: {out.get(f'{tag}_iter_ms')} ms/iter "
                  f"(roll {out.get(f'{tag}_rollout_ms')} + "
                  f"upd {out.get(f'{tag}_update_ms')}), "
                  f"{out.get(f'{tag}_env_steps_per_sec')} steps/s", flush=True)
            del runner, ts, it
    os.makedirs("results", exist_ok=True)
    with open("results/profile_mappo_happo_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
