#!/usr/bin/env python
"""rl_games-style trainer surface (reference train_rlgames.py:33-60).

The reference's alternative path drives the external `rl_games` library
(with --horovod multi-GPU).  The TPU-native equivalent is the same PPO core
with rl-games-flavored config translation; multi-chip scaling comes from the
jax.sharding mesh instead of horovod (massive_marl_tpu/parallel/mesh.py).
"""
import argparse

from massive_marl_tpu.utils import config as cfg_mod
from massive_marl_tpu.utils.registry import build_env
from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig


def main():
    p = argparse.ArgumentParser("rlgames-style trainer")
    p.add_argument("--task", default="TenAnt", choices=cfg_mod.TASKS)
    p.add_argument("--num_envs", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_iterations", type=int, default=0)
    p.add_argument("--horovod", action="store_true",
                   help="accepted for CLI parity; scaling uses the jax mesh")
    args = p.parse_args()
    ns = argparse.Namespace(task=args.task, algo="ppo", num_envs=args.num_envs,
                            episode_length=0, seed=args.seed, logdir="",
                            cfg_train="", cfg_env="", randomize=False,
                            max_iterations=args.max_iterations)
    cfg, cfg_train, logdir = cfg_mod.load_cfg(ns)
    env = build_env(args.task, cfg, multi_agent=False)
    trainer = PPO(env, num_envs=cfg["env"]["numEnvs"],
                  cfg=PPOConfig.from_cfg_train(cfg_train),
                  seed=cfg["seed"], log_dir=logdir)
    trainer.run(args.max_iterations or None)


if __name__ == "__main__":
    main()
