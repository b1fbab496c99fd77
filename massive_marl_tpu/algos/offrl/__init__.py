"""Offline RL family: ppo_collect (dataset dumper), TD3+BC, BCQ, IQL.

Re-design of agents/algorithms/offrl/ (process_offrl.py:2-147): datasets are
.npy files (states/actions/rewards/dones/next_states, ppo_collect.py:135-165)
under <dataset_dir>/<task>_<datatype>/.
"""
from __future__ import annotations


def run_offrl(args, cfg, cfg_train, logdir):
    algo = args.algo
    if algo == "ppo_collect":
        from massive_marl_tpu.algos.offrl.collect import PPOCollect
        from massive_marl_tpu.utils.registry import build_env
        env = build_env(args.task, cfg, multi_agent=False)
        runner = PPOCollect(env, num_envs=cfg["env"]["numEnvs"], cfg_train=cfg_train,
                            seed=cfg.get("seed", 0), log_dir=logdir,
                            dataset_dir=cfg_train["learn"].get("dataset_dir", "./datasets"),
                            task=args.task, datatype=args.datatype)
        runner.run(args.max_iterations or None)
        return runner
    from massive_marl_tpu.algos.offrl.trainers import OfflineTrainer, OfflineConfig
    ocfg = OfflineConfig.from_cfg_train(cfg_train, algo)
    trainer = OfflineTrainer(task=args.task, datatype=args.datatype, cfg=ocfg,
                             seed=cfg.get("seed", 0), log_dir=logdir)
    trainer.run(args.max_iterations or None)
    # close the loop: report the offline policy's live-env reward
    from massive_marl_tpu.utils.registry import build_env
    env = build_env(args.task, cfg, multi_agent=False)
    print(f"[{algo}] online eval mean reward/step:",
          trainer.eval_online(env, num_envs=64, n_steps=1000))
    return trainer
