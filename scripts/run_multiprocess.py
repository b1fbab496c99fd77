"""Multi-PROCESS execution of the distributed layer (SURVEY.md section 2.4/5).

Launches N real OS processes on localhost, each of which calls
`massive_marl_tpu.parallel.mesh.init_distributed` (jax.distributed
coordinator handshake), builds ONE global ('data','model') mesh spanning all
processes, and runs full TenAnt+PPO and TenAnt+MAPPO training iterations
with the env batch sharded across processes - cross-process psum/all-gather
collectives ride the Gloo CPU backend here, exactly where ICI/DCN
collectives ride on a real TPU pod.

Correctness oracle (same as tests/test_distributed.py:69): every process
also runs the identical-seed UNSHARDED single-device iteration locally and
asserts the resulting parameters match the cross-process run to f32
reduction-order tolerance.

Usage:
  launcher:  python scripts/run_multiprocess.py --nproc 2 [--local_devices 1]
             [--iters 2] [--out /tmp/mp.json]
  (worker mode, spawned internally: --process_id I --coordinator HOST:PORT)

The reference has no multi-process story at all (its --horovod flag is
rejected for the rl-pytorch path, reference agents/utils/config.py:228-229,
299-300); this is the TPU framework's replacement for that gap, runnable
without TPU hardware.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ----------------------------------------------------------------- worker
def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from massive_marl_tpu.parallel import mesh as meshlib

    # the component under test: the real multi-host bring-up
    initialized = meshlib.init_distributed(coordinator=args.coordinator,
                                           num_processes=args.nproc,
                                           process_id=args.process_id)
    assert initialized, "init_distributed must initialize for nproc > 1"

    import jax.numpy as jnp
    import numpy as np

    pid = jax.process_index()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert jax.process_count() == args.nproc, (jax.process_count(), args.nproc)
    assert n_global == args.nproc * n_local, (n_global, args.nproc, n_local)
    # cross-process reality check: this process does NOT own every device
    assert n_global > n_local, "mesh must span processes"

    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
    from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
    from massive_marl_tpu.envs.ten_ant import TenAntEnv

    mesh = meshlib.make_mesh(n_global)

    # form the cross-process Gloo clique NOW, while every process is at the
    # same early point: the first collective initializes the clique with a
    # 30s peer-rendezvous timeout, and the heavyweight single-process
    # reference compiles below can skew processes past it (observed under
    # pytest).  One tiny psum while in lockstep, and every later collective
    # reuses the established context.
    from jax.sharding import NamedSharding, PartitionSpec as P

    probe = jax.make_array_from_callback(
        (n_global,), NamedSharding(mesh, P("data")),
        lambda idx: np.arange(n_global, dtype=np.float32)[idx])
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(probe)
    np.testing.assert_allclose(np.asarray(total.addressable_data(0)),
                               n_global * (n_global - 1) / 2)

    env = TenAntEnv({"sim": {"substeps": 2}})
    num_envs = 2 * n_global
    report = {"process_id": pid, "n_processes": args.nproc,
              "n_global_devices": n_global, "n_local_devices": n_local}

    def tree_diff(a, b):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        return max(float(jnp.max(jnp.abs(jnp.asarray(np.asarray(x), jnp.float32)
                                          - jnp.asarray(np.asarray(y), jnp.float32))))
                   for x, y in zip(fa, fb))

    def fetch(tree):
        """Replicated global leaves -> host numpy (every shard identical)."""
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x.addressable_data(0)), tree)

    # ---------------- TenAnt + PPO: env batch sharded over processes -------
    cfg = PPOConfig(nsteps=4, nminibatches=2, noptepochs=2, hidden=(32, 32))

    # unsharded same-seed reference, local to this process
    ref = PPO(env, num_envs=num_envs, cfg=cfg, seed=0, print_log=False)
    ts_ref = ref.init_state()
    it_ref = jax.jit(ref._make_train_iter())
    for _ in range(args.iters):
        ts_ref, m_ref = it_ref(ts_ref)
    ref_params = jax.device_get(ts_ref.params)

    # cross-process run: same host-side init placed onto the global mesh
    ppo = PPO(env, num_envs=num_envs, cfg=cfg, seed=0, print_log=False,
              mesh=mesh)
    ts0 = jax.device_get(ppo.init_state())
    shardings = meshlib.train_state_shardings(ts0, mesh)
    with mesh:
        ts = meshlib.host_to_global(ts0, shardings)
        step = jax.jit(ppo._make_train_iter(), in_shardings=(shardings,),
                       out_shardings=(shardings, None))
        for _ in range(args.iters):
            ts, m_sh = step(ts)
    diff = tree_diff(ref_params, fetch(ts.params))
    report["ppo_param_max_abs_diff"] = diff
    report["ppo_mean_reward_ref"] = float(np.asarray(m_ref["mean_reward"]))
    report["ppo_mean_reward_sharded"] = float(
        np.asarray(m_sh["mean_reward"].addressable_data(0)))
    assert diff < 2e-4, f"PPO params diverged across processes: {diff}"
    assert abs(report["ppo_mean_reward_ref"]
               - report["ppo_mean_reward_sharded"]) < 1e-3
    # env state really is distributed: local shards < global batch
    es_leaf = jax.tree_util.tree_leaves(ts.env_state)[0]
    local_rows = sum(s.data.shape[0] for s in es_leaf.addressable_shards)
    assert local_rows == num_envs * n_local // n_global, (
        local_rows, num_envs, n_local, n_global)
    report["ppo_local_env_rows"] = local_rows

    # ---------------- TenAnt + MAPPO: rollout shard_mapped over 'data' -----
    mcfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                      hidden_size=32, layer_n=1)
    mref = MarlRunner(env, num_envs=num_envs, cfg=mcfg, seed=0,
                      print_log=False)
    mts_ref = mref.init_state()
    mit_ref = mref._train_iter
    for _ in range(args.iters):
        mts_ref, mm_ref = mit_ref(mts_ref)
    ref_actor = jax.device_get(mts_ref.actor_params)
    ref_critic = jax.device_get(mts_ref.critic_params)

    mrun = MarlRunner(env, num_envs=num_envs, cfg=mcfg, seed=0,
                      print_log=False, mesh=mesh)
    mts0 = jax.device_get(mrun.init_state())
    msh = meshlib.train_state_shardings(mts0, mesh)
    with mesh:
        mts = meshlib.host_to_global(mts0, msh)
        for _ in range(args.iters):
            mts, mm_sh = mrun._train_iter(mts)
    da = tree_diff(ref_actor, fetch(mts.actor_params))
    dc = tree_diff(ref_critic, fetch(mts.critic_params))
    report["mappo_actor_max_abs_diff"] = da
    report["mappo_critic_max_abs_diff"] = dc
    report["mappo_mean_reward_ref"] = float(np.asarray(mm_ref["mean_reward"]))
    report["mappo_mean_reward_sharded"] = float(
        np.asarray(mm_sh["mean_reward"].addressable_data(0)))
    assert da < 2e-4 and dc < 2e-4, (da, dc)
    assert abs(report["mappo_mean_reward_ref"]
               - report["mappo_mean_reward_sharded"]) < 1e-3

    report["ok"] = True
    if args.out and pid == 0:
        with open(args.out, "w") as f:
            json.dump(report, f)
    print(f"[p{pid}] multiprocess ok: {json.dumps(report)}", flush=True)


# ---------------------------------------------------------------- launcher
def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(args) -> int:
    port = args.port or free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{args.local_devices}",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = []
    for i in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--nproc", str(args.nproc), "--process_id", str(i),
               "--coordinator", coord, "--iters", str(args.iters),
               "--local_devices", str(args.local_devices)]
        if args.out:
            cmd += ["--out", args.out]
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO))
    rc = 0
    for i, p in enumerate(procs):
        try:
            r = p.wait(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            r = -9
        if r != 0:
            print(f"[launcher] process {i} exited {r}", file=sys.stderr)
            rc = 1
    if rc == 0 and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            print(json.dumps(json.load(f)))
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=1)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
