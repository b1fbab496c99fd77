"""CLI trainer: the reference train.py surface (train.py:20-96) on the TPU
stack.  Dispatches --algo into the five families (train.py:24-84):

  MARL   mappo | happo | hatrpo | ippo | maddpg  -> MarlRunner / MaddpgRunner
  SARL   ppo | trpo | ddpg | td3 | sac           -> PPO / TRPO / OffPolicy
  MTRL   mtppo | random                           -> MultiTask trainers
  meta   mamlppo                                  -> MAML-PPO
  offRL  td3_bc | bcq | iql | ppo_collect         -> offline trainers
"""
from __future__ import annotations

import os

from massive_marl_tpu.utils import config as cfg_mod
from massive_marl_tpu.utils.registry import build_env


def process_sarl(args, env, cfg_train, logdir, num_envs, mesh=None):
    algo = args.algo
    if algo == "ppo":
        from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
        cfg = PPOConfig.from_cfg_train(cfg_train)
        trainer = PPO(env, num_envs=num_envs, cfg=cfg, seed=cfg_train["seed"],
                      log_dir=logdir, mesh=mesh)
    elif algo == "trpo":
        from massive_marl_tpu.algos.rl.trpo import TRPO, TRPOConfig
        cfg = TRPOConfig.from_cfg_train(cfg_train)
        trainer = TRPO(env, num_envs=num_envs, cfg=cfg, seed=cfg_train["seed"],
                       log_dir=logdir, mesh=mesh)
    else:
        from massive_marl_tpu.algos.rl.offpolicy import OffPolicy, OffPolicyConfig
        cfg = OffPolicyConfig.from_cfg_train(cfg_train, algo)
        trainer = OffPolicy(env, num_envs=num_envs, cfg=cfg, seed=cfg_train["seed"],
                            log_dir=logdir, mesh=mesh)
    return trainer


def setup_distributed():
    """Multi-host SPMD bring-up for the CLI (SURVEY.md section 2.4/5).

    Reads MMT_COORDINATOR / MMT_NUM_PROCESSES / MMT_PROCESS_ID from the
    environment (parallel/mesh.init_distributed), so a real multi-host launch
    is the SAME `python -m massive_marl_tpu.cli.train ...` command on every
    host plus three env vars - scripts/run_multiprocess.sh demonstrates it
    with CPU processes over localhost.  Returns a global ('data','model')
    mesh spanning every process, or None when single-process.
    """
    import jax

    # honor the JAX_PLATFORMS env var even when the runtime's sitecustomize
    # latched another platform via the config API at interpreter start (the
    # axon tunnel does; see tests/conftest.py) - must happen before the
    # backend initializes, or jax.distributed is silently ignored
    envp = os.environ.get("JAX_PLATFORMS")
    if envp and jax.config.jax_platforms != envp:
        jax.config.update("jax_platforms", envp)
    from massive_marl_tpu.parallel import mesh as meshlib
    if not meshlib.init_distributed():
        return None
    print(f"[dist] process {jax.process_index()}/{jax.process_count()}: "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global devices")
    return meshlib.make_mesh()


def _place_state_global(runner, mesh):
    """Multi-process only: the runner's initial state must be materialized as
    GLOBAL arrays (env batch sharded over all processes' devices, params
    replicated) before the first train step - device arrays from a plain
    init_state() are process-local and cannot feed a mesh that spans
    processes."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return
    from massive_marl_tpu.parallel import mesh as meshlib
    st = runner.state if getattr(runner, "state", None) is not None \
        else runner.init_state()
    runner.state = meshlib.place_global(st, mesh)


def export_viewer(env, runner, logdir, task, n_steps: int | None = None):
    """Interactive-episode export on `--test` without --headless: rolls one
    deterministic episode and writes a self-contained viewer_<task>.html
    (utils/viewer.export_interactive - playback/camera/keyboard, the TPU-side
    counterpart of the reference's IsaacGym viewer, base_task.py:90-109).
    Best-effort: the viewer is cosmetic, so failures only warn."""
    import jax
    import jax.numpy as jnp

    from massive_marl_tpu.utils.viewer import (export_interactive,
                                               record_episode_3d)
    if n_steps is None:
        n_steps = int(os.environ.get("VIEWER_STEPS", 200))
    try:
        state = runner.state if getattr(runner, "state", None) is not None \
            else runner.init_state()
        if hasattr(runner, "actor"):        # MARL runner: per-agent means
            clip = runner.cfg.clip_obs

            def policy(obs):
                o, _ = runner._agent_views(jnp.clip(obs, -clip, clip)[None])
                mean, _ = jax.vmap(lambda p, x: runner.actor.apply(p, x),
                                   in_axes=(0, 1), out_axes=1)(
                    state.actor_params, o)
                return jnp.clip(mean[0].reshape(-1), -1, 1)
        else:                               # SARL: joint-action mean
            clip = runner.cfg.clip_obs

            def policy(obs):
                mean, _, _ = runner.model.apply(
                    state.params, jnp.clip(obs, -clip, clip)[None])
                return jnp.clip(mean[0], -1, 1)

        ant, box = record_episode_3d(env, policy, n_steps=n_steps)
        out = os.path.join(logdir or ".", f"viewer_{task}.html")
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        export_interactive(ant, box, out=out)
        print("interactive viewer written:", out)
    except Exception as e:  # noqa: BLE001 - cosmetic surface
        print(f"viewer export skipped ({type(e).__name__}: {e})")


def evaluate_sarl(trainer, env, num_envs, n_episodes: int = 32, seed: int = 0):
    """Deterministic (mean-action) episode evaluation - the bounded,
    episode-faithful version of the reference's endless --test loop
    (ppo.py:103-112): dedicated fresh-reset eval envs, mean per-episode
    return over the first completed episode of each env."""
    import jax
    import jax.numpy as jnp
    if trainer.state is None:
        trainer.state = trainer.init_state()
    E = max(1, min(n_episodes, num_envs))
    horizon = int(getattr(env, "max_episode_length", 1000))

    def step(carry, _):
        st, ret, alive = carry
        a = trainer.act_inference(st.obs)
        st = jax.vmap(env.step)(st, jnp.clip(a, -1.0, 1.0))
        ret = ret + jnp.where(alive, st.reward, 0.0)
        alive = alive & ~st.done
        return (st, ret, alive), None

    def run(key):
        st = jax.vmap(env.reset)(jax.random.split(key, E))
        (_, ret, _), _ = jax.lax.scan(
            step, (st, jnp.zeros(E), jnp.ones(E, bool)), None, length=horizon)
        return ret.mean()

    return float(jax.jit(run)(jax.random.PRNGKey(seed + 10_000)))


def train(args=None):
    args = args or cfg_mod.get_args()
    cfg_mod.set_np_formatting()
    # multi-host SPMD: no-op unless MMT_NUM_PROCESSES > 1 is in the env.
    # Must run BEFORE load_cfg: with --seed -1 every process would otherwise
    # draw its OWN random seed (load_cfg, reference config.py:35-59) and the
    # "same program on every host" SPMD contract breaks - the seed is drawn
    # once on process 0 and broadcast.
    mesh = setup_distributed()
    if mesh is not None:
        import random

        import jax
        import numpy as np
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            seed = args.seed if args.seed >= 0 else random.randint(0, 10000)
            args.seed = int(multihost_utils.broadcast_one_to_all(np.int32(seed)))
    cfg, cfg_train, logdir = cfg_mod.load_cfg(args)
    num_envs = cfg["env"]["numEnvs"]
    algo = args.algo
    if mesh is not None:
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            logdir = None  # one writer/checkpointer per job: process 0
    # reference semantics: --test implies play; --play alone also disables
    # training (reference config.py:288-294)
    args.test = bool(args.test or getattr(args, "play", False))
    # --resume N: resume from the latest checkpoint (reference --resume flag)
    if getattr(args, "resume", 0) > 0 and not args.model_dir:
        args.model_dir = "latest"
    # benchmark mode (the reference's dormant --random_actions/--bench_* flags,
    # config.py:266-272): time random-action env stepping, write JSON, exit
    if getattr(args, "random_actions", False):
        return _bench_random_actions(args, cfg, num_envs, logdir)

    if algo in cfg_mod.MARL_ALGOS:
        env = build_env(args.task, cfg, multi_agent=True)
        if algo == "mat":
            from massive_marl_tpu.algos.marl.mat import MatConfig, MatRunner
            mat_cfg = MatConfig.from_cfg_train(cfg_train if isinstance(cfg_train, dict) else {})
            runner = MatRunner(env, num_envs=num_envs, cfg=mat_cfg,
                               seed=cfg.get("seed", 0), log_dir=logdir,
                               mesh=mesh)
        elif algo == "maddpg":
            from massive_marl_tpu.algos.marl.maddpg import MaddpgRunner, MaddpgConfig
            runner = MaddpgRunner(env, num_envs=num_envs,
                                  cfg=MaddpgConfig.from_cfg_train(cfg_train),
                                  seed=cfg.get("seed", 0), log_dir=logdir,
                                  mesh=mesh)
        else:
            from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
            mc = MarlConfig.from_cfg_train(cfg_train, algo)
            if mc.use_recurrent_policy:
                from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner
                runner = RecurrentMarlRunner(env, num_envs=num_envs, cfg=mc,
                                             seed=cfg.get("seed", 0), log_dir=logdir,
                                             mesh=mesh)
            else:
                runner = MarlRunner(env, num_envs=num_envs, cfg=mc,
                                    seed=cfg.get("seed", 0), log_dir=logdir,
                                    mesh=mesh)
        if args.model_dir:
            path = (cfg_mod.latest_checkpoint(logdir) if args.model_dir == "latest"
                    else args.model_dir)
            if path is None:
                print(f"no checkpoint found under {logdir}; starting fresh "
                      "(pass a fixed --seed so --resume finds the prior run's logdir)")
            else:
                runner.restore(path)
        if args.test:
            print("eval mean episode reward:", runner.eval())
            if not args.headless:
                export_viewer(env, runner, logdir, args.task)
            return runner
        _place_state_global(runner, mesh)
        if algo == "maddpg":
            # off-policy runner counts iterations, not env steps
            runner.run(args.max_iterations or None)
        else:
            steps = args.num_env_steps or None
            if steps is None and args.max_iterations > 0:
                steps = args.max_iterations * runner.cfg.episode_length * num_envs
            runner.run(steps)
        return runner

    if algo in cfg_mod.SARL_ALGOS:
        env = build_env(args.task, cfg, multi_agent=False)
        trainer = process_sarl(args, env, cfg_train, logdir, num_envs, mesh=mesh)
        if args.model_dir:
            path = (cfg_mod.latest_checkpoint(logdir) if args.model_dir == "latest"
                    else args.model_dir)
            if path is None:
                print(f"no checkpoint found under {logdir}; starting fresh "
                      "(pass a fixed --seed so --resume finds the prior run's logdir)")
            else:
                trainer.load(path)
        if args.test:
            print("eval mean reward/step:", evaluate_sarl(trainer, env, num_envs))
            if not args.headless:
                export_viewer(env, trainer, logdir, args.task)
            return trainer
        _place_state_global(trainer, mesh)
        n = args.max_iterations or None
        trainer.run(n)
        return trainer

    if mesh is not None:
        import jax
        if jax.process_count() > 1:
            raise NotImplementedError(
                f"multi-process CLI launch supports the SARL and MARL "
                f"families; --algo {algo} runs single-process (its mesh "
                f"support is exercised in-process, tests/test_distributed.py)")

    if algo in cfg_mod.MTRL_ALGOS:
        from massive_marl_tpu.algos.mtrl.mtppo import MTPPO, MTPPOConfig, RandomPolicyRunner
        # task set from the train cfg (the reference's MultiTask wrapper reads
        # task_envs off the task object, multi_task_vec_task.py:32-35; here
        # the cfg names the single-agent tasks to compose)
        task_names = cfg_train.get("tasks", ["OneAnt", "MultiAntCircle"])
        envs = {t: build_env(t, _load_env_cfg(t), multi_agent=False)
                for t in task_names}
        if algo == "random":
            runner = RandomPolicyRunner(envs, num_envs=num_envs, seed=cfg.get("seed", 0))
            runner.run(args.max_iterations or 10)
            return runner
        if algo == "mtsac":
            from massive_marl_tpu.algos.mtrl.mtsac import MTSAC, MTSACConfig
            trainer = MTSAC(envs, num_envs=num_envs,
                            cfg=MTSACConfig.from_cfg_train(cfg_train, "sac"),
                            seed=cfg.get("seed", 0), log_dir=logdir)
        elif algo == "mttrpo":
            from massive_marl_tpu.algos.mtrl.mttrpo import MTTRPO, MTTRPOConfig
            trainer = MTTRPO(envs, num_envs=num_envs, cfg=MTTRPOConfig.from_cfg_train(cfg_train),
                             seed=cfg.get("seed", 0), log_dir=logdir)
        else:
            trainer = MTPPO(envs, num_envs=num_envs, cfg=MTPPOConfig.from_cfg_train(cfg_train),
                            seed=cfg.get("seed", 0), log_dir=logdir)
        trainer.run(args.max_iterations or None)
        return trainer

    if algo in cfg_mod.METARL_ALGOS:
        from massive_marl_tpu.algos.metarl.maml import MAMLPPO, MAMLConfig
        env = build_env(args.task, cfg, multi_agent=False)
        trainer = MAMLPPO(env, num_envs=num_envs, cfg=MAMLConfig.from_cfg_train(cfg_train),
                          seed=cfg.get("seed", 0), log_dir=logdir)
        trainer.run(args.max_iterations or None)
        return trainer

    if algo in cfg_mod.OFFRL_ALGOS:
        from massive_marl_tpu.algos.offrl import run_offrl
        return run_offrl(args, cfg, cfg_train, logdir)

    raise ValueError(f"unknown algo {algo}")


def _bench_random_actions(args, cfg, num_envs, logdir):
    """Random-action env-throughput benchmark (implements the reference's
    dormant --random_actions/--bench_len/--bench_file flags, config.py:266-272).
    Prints and optionally appends one JSON line per report."""
    import json
    import time

    import jax
    import jax.numpy as jnp

    env = build_env(args.task, cfg, multi_agent=False)
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    st = jax.jit(jax.vmap(env.reset))(jax.random.split(key, num_envs))
    act_dim = env.num_actions * env.num_agents
    steps_per_chunk = 256

    def chunk(st, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, act_dim), minval=-1.0, maxval=1.0)
            s = jax.vmap(env.step)(s, a)
            return (s, k), None
        (st, key), _ = jax.lax.scan(body, (st, key), None, length=steps_per_chunk)
        return st, key

    chunk = jax.jit(chunk, donate_argnums=(0,))
    st, key = chunk(st, key)  # compile
    jax.block_until_ready(st.obs)
    results = []
    for i in range(args.bench_len):
        t0 = time.perf_counter()
        st, key = chunk(st, key)
        jax.block_until_ready(st.obs)
        dt = time.perf_counter() - t0
        rec = {"report": i, "env_steps_per_s": num_envs * steps_per_chunk / dt,
               "num_envs": num_envs, "task": args.task}
        print(json.dumps(rec))
        results.append(rec)
    if args.bench_file:
        with open(args.bench_file, "a") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")
    return results


def _load_env_cfg(task):
    import yaml
    with open(os.path.join(cfg_mod.CFG_ROOT, f"{task}.yaml")) as f:
        return yaml.safe_load(f)


if __name__ == "__main__":
    train()
