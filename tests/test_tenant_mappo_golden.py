"""TenAnt+MAPPO golden-seed learning regression (VERDICT r3 item 8).

The north-star task's MARL learning path, regression-guarded on CPU like
the OneAnt+PPO twin (tests/test_ppo.py::test_oneant_ppo_golden_seed_
regression): a fixed-seed 20-iteration run through the SHIPPED TenAnt.yaml
env config must stay finite and hold a generous reward band.  Calibrated
r4: rewards start ~15 (survival + goal-distance terms), dip through the
on-policy exploration trough, and recover.  Under friction_combine=
multiply the last-5 mean measured 9.3 (max 18.7); under the shipped
'average' default it measures 2.7 (max 18.9, trough later) - both inside
the band.  A sign/scale bug in the 10-agent reward plumbing or a physics
regression lands far outside it; NaN/collapse fails outright.
"""
import os

import numpy as np
import pytest
import yaml


def test_tenant_mappo_golden_seed_regression():
    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
    from massive_marl_tpu.envs.ten_ant import TenAntEnv
    from massive_marl_tpu.utils.config import CFG_ROOT

    with open(os.path.join(CFG_ROOT, "TenAnt.yaml")) as f:
        cfg_env = yaml.safe_load(f)
    env = TenAntEnv(cfg_env)
    cfg = MarlConfig(algorithm_name="mappo", hidden_size=64, layer_n=1,
                     ppo_epoch=2)
    runner = MarlRunner(env, num_envs=8, cfg=cfg, seed=1, print_log=False)
    ts = runner.init_state()
    rewards = []
    for _ in range(20):
        ts, m = runner._train_iter(ts)
        rewards.append(float(m["mean_reward"]))
    assert np.isfinite(rewards).all(), rewards
    # calibrated band (see module docstring); generous on both sides so
    # legitimate physics/net changes move the curve without tripping it
    assert -5.0 < np.mean(rewards[-5:]) < 30.0, np.mean(rewards[-5:])
    assert max(rewards) > 3.0, rewards   # the task's positive reward scale
    # reward-SCALE tripwire (VERDICT r4 weak item 5: the wide band alone
    # would admit a 2x scale regression): iteration-0 reward is dominated by
    # the deterministic survival + goal-distance terms (~15 under the
    # shipped physics, observed 14.8-15.2 across r4/r5 runs); a 2x or 0.5x
    # scale bug lands at ~30 / ~7.5, both outside this window
    assert 8.0 < rewards[0] < 25.0, rewards[0]
