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
    p.add_argument("--steps_num", type=int, default=-1,
                   help="override rollout horizon (reference config.py:251-252)")
    p.add_argument("--minibatch_size", type=int, default=-1,
                   help="override minibatch size (reference config.py:253-254)")
    p.add_argument("--checkpoint", type=str, default="Base",
                   help="load a checkpoint before training (reference rl_games load_path)")
    args = p.parse_args()
    ns = argparse.Namespace(task=args.task, algo="ppo", num_envs=args.num_envs,
                            episode_length=0, seed=args.seed, logdir="",
                            cfg_train="", cfg_env="", randomize=False,
                            max_iterations=args.max_iterations)
    cfg, cfg_train, logdir = cfg_mod.load_cfg(ns)
    # rl_games-style CLI overrides (reference config.py:301-304)
    learn = cfg_train.setdefault("learn", {})
    if args.steps_num != -1:
        learn["nsteps"] = args.steps_num
    if args.minibatch_size != -1:
        num_envs = cfg["env"]["numEnvs"]
        batch = learn.get("nsteps", 8) * num_envs
        learn["nminibatches"] = max(1, batch // args.minibatch_size)
    env = build_env(args.task, cfg, multi_agent=False)
    trainer = PPO(env, num_envs=cfg["env"]["numEnvs"],
                  cfg=PPOConfig.from_cfg_train(cfg_train),
                  seed=cfg["seed"], log_dir=logdir)
    if args.checkpoint != "Base":
        trainer.load(args.checkpoint)
    trainer.run(args.max_iterations or None)


if __name__ == "__main__":
    main()
