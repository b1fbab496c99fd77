"""Config/flag system.

Mirrors the reference's two-yaml convention (utils/config.py:62-178): every
task maps to an env yaml (cfg/<Task>.yaml) and each algorithm to a train yaml
(cfg/<algo>/config.yaml), with CLI overrides for num_envs / episode length /
seed.  `get_args` reproduces the reference's flag surface
(utils/config.py:216-321) minus the IsaacGym-specific plumbing.
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CFG_ROOT = os.path.join(REPO_ROOT, "cfg")

SARL_ALGOS = ["ppo", "trpo", "ddpg", "td3", "sac"]
MARL_ALGOS = ["mappo", "happo", "hatrpo", "ippo", "maddpg", "mat"]
MTRL_ALGOS = ["mtppo", "mtsac", "mttrpo", "random"]
METARL_ALGOS = ["mamlppo"]
OFFRL_ALGOS = ["td3_bc", "bcq", "iql", "ppo_collect"]
ALL_ALGOS = SARL_ALGOS + MARL_ALGOS + MTRL_ALGOS + METARL_ALGOS + OFFRL_ALGOS

TASKS = ["OneAnt", "TenAnt", "MultiAntCircle", "MultiIngenuity"]


def get_args(argv=None):
    p = argparse.ArgumentParser("massive_marl_tpu trainer")
    p.add_argument("--task", type=str, default="TenAnt", choices=TASKS)
    p.add_argument("--algo", type=str, default="ppo", choices=ALL_ALGOS)
    p.add_argument("--num_envs", type=int, default=0, help="override cfg numEnvs")
    p.add_argument("--episode_length", type=int, default=0, help="override episodeLength")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--max_iterations", type=int, default=0)
    p.add_argument("--num_env_steps", type=int, default=0, help="MARL total steps override")
    p.add_argument("--test", action="store_true")
    p.add_argument("--play", action="store_true")
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--logdir", type=str, default="")
    p.add_argument("--experiment", "--experiment_name", dest="experiment",
                   type=str, default="Base",
                   help="experiment name; with --metadata, task-type/device/"
                        "engine info is appended (reference config.py:236-240)")
    p.add_argument("--metadata", action="store_true")
    p.add_argument("--cfg_train", type=str, default="")
    p.add_argument("--cfg_env", type=str, default="")
    p.add_argument("--randomize", action="store_true", help="enable domain randomization")
    p.add_argument("--datatype", type=str, default="expert",
                   help="offline RL dataset flavor (process_offrl.py:40-44)")
    # --- reference flag-surface parity (config.py:216-321) ---
    p.add_argument("--task_type", type=str, default="Python",
                   help="accepted for parity; the wrapper flavor is inferred from --algo")
    p.add_argument("--rl_device", type=str, default="tpu",
                   help="'cpu' forces JAX_PLATFORMS=cpu; anything else uses the default backend")
    p.add_argument("--headless", action="store_true",
                   help="accepted for parity; there is no interactive viewer on the hot path")
    p.add_argument("--horovod", action="store_true",
                   help="rejected like the reference (config.py:299-300); use the jax mesh")
    p.add_argument("--torch_deterministic", action="store_true",
                   help="accepted for parity; jit purity + fixed PRNG keys are deterministic by construction")
    p.add_argument("--resume", type=int, default=0,
                   help=">0 resumes from the latest checkpoint in the logdir (reference --resume)")
    p.add_argument("--checkpoint", type=str, default="Base",
                   help="rl_games-style load path; rejected on the native path like the reference (config.py:305-306)")
    p.add_argument("--minibatch_size", type=int, default=-1,
                   help="rl_games-style minibatch override (train_rlgames.py path)")
    p.add_argument("--steps_num", type=int, default=-1,
                   help="rl_games-style horizon override (train_rlgames.py path)")
    p.add_argument("--num_proc", type=int, default=1,
                   help="accepted for parity; envs are jitted on-device, no worker processes")
    p.add_argument("--random_actions", action="store_true",
                   help="benchmark mode: run random actions instead of a policy")
    p.add_argument("--bench_len", type=int, default=10,
                   help="number of timing reports in benchmark mode")
    p.add_argument("--bench_file", type=str, default="",
                   help="file to append benchmark JSON results to")
    args = p.parse_args(argv)
    if args.horovod:
        raise SystemExit("Distributed training with Horovod is not supported; "
                         "use the jax.sharding mesh (massive_marl_tpu.parallel.mesh).")
    if args.checkpoint != "Base":
        raise SystemExit("--checkpoint is not supported on the native path. "
                         "Please use --resume or --model_dir (reference config.py:305-306).")
    if args.rl_device == "cpu":
        import sys
        if os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu"):
            print(f"warning: --rl_device cpu overriding JAX_PLATFORMS="
                  f"{os.environ['JAX_PLATFORMS']}")
        if "jax" in sys.modules:
            print("warning: --rl_device cpu set after jax import; backend "
                  "may already be initialized")
        os.environ["JAX_PLATFORMS"] = "cpu"
    return args


def retrieve_cfg(args):
    """task/algo -> (logdir, cfg_train path, cfg_env path) (config.py:62-87)."""
    logdir = args.logdir or os.path.join(REPO_ROOT, "logs", args.task.lower(), args.algo)
    # experiment / metadata logdir suffix (reference config.py:167-174)
    exp = getattr(args, "experiment", "Base")
    if exp != "Base":
        if getattr(args, "metadata", False):
            import jax
            device = jax.default_backend()
            logdir += f"_{exp}_{getattr(args, 'task_type', 'Python')}_{device}_jaxphys"
            if getattr(args, "randomize", False):
                logdir += "_DR"
        else:
            logdir += f"_{exp}"
    cfg_train = args.cfg_train or os.path.join(CFG_ROOT, args.algo, "config.yaml")
    cfg_env = args.cfg_env or os.path.join(CFG_ROOT, f"{args.task}.yaml")
    return logdir, cfg_train, cfg_env


def load_cfg(args):
    """Load + apply CLI overrides (config.py:90-178)."""
    logdir, cfg_train_path, cfg_env_path = retrieve_cfg(args)
    with open(cfg_train_path) as f:
        cfg_train = yaml.safe_load(f)
    with open(cfg_env_path) as f:
        cfg = yaml.safe_load(f)

    if args.num_envs > 0:
        cfg["env"]["numEnvs"] = args.num_envs
    if args.episode_length > 0:
        cfg["env"]["episodeLength"] = args.episode_length
    if args.randomize:
        cfg.setdefault("task", {})["randomize"] = True

    # seed handling (config.py:35-59): -1 -> random
    seed = args.seed if args.seed >= 0 else random.randint(0, 10000)
    cfg["seed"] = seed
    cfg_train["seed"] = seed
    np.random.seed(seed)
    random.seed(seed)

    logdir = os.path.join(logdir, f"seed{seed}")
    return cfg, cfg_train, logdir


def set_np_formatting():
    np.set_printoptions(edgeitems=30, infstr="inf", linewidth=4000, nanstr="nan",
                        precision=2, suppress=False, threshold=10000, formatter=None)


def get_agent_index(cfg) -> list:
    """Parse the AgentIndex grouping from an env cfg (reference
    get_AgentIndex, agents/utils/process_marl.py:9-16)."""
    import ast
    raw = cfg.get("env", {}).get("AgentIndex", "[[0]]")
    if isinstance(raw, str):
        return ast.literal_eval(raw)
    return raw


def latest_checkpoint(logdir: str, prefix: str = "") -> str | None:
    """Most recent .ckpt under logdir (auto-resume support; the reference
    requires a manual --model_dir, SURVEY.md section 5)."""
    import glob
    paths = glob.glob(os.path.join(logdir, "**", f"{prefix}*.ckpt"), recursive=True)
    return max(paths, key=os.path.getmtime) if paths else None
