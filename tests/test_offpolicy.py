"""Off-policy trainer tests: replay ring mechanics and learning on the toy env."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.algos.rl.offpolicy import OffPolicy, OffPolicyConfig
from tests.test_ppo import ToyEnv


@pytest.mark.parametrize("algo", ["sac", "td3", "ddpg"])
def test_offpolicy_iteration_runs(algo):
    cfg = OffPolicyConfig(algo=algo, nsteps=4, noptepochs=1, nminibatches=1,
                          replay_size=32, batch_size=4, hidden_nodes=32,
                          hidden_layer=2)
    trainer = OffPolicy(ToyEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts = trainer.init_state()
    ts, m = trainer._collect_iter(ts)
    assert int(ts.replay.count) == 4
    assert int(ts.replay.ptr) == 4
    ts, m = trainer._train_iter(ts)
    assert int(ts.replay.count) == 8
    assert np.isfinite(float(m["q_loss"]))
    # ring wraps
    for _ in range(8):
        ts, m = trainer._train_iter(ts)
    assert int(ts.replay.count) == 32
    assert int(ts.replay.ptr) == (4 + 9 * 4) % 32


@pytest.mark.slow
def test_sac_learns_toy():
    cfg = OffPolicyConfig(algo="sac", nsteps=8, noptepochs=1, nminibatches=2,
                          replay_size=256, batch_size=8, hidden_nodes=64,
                          hidden_layer=2, lr=1e-3, gamma=0.95)
    trainer = OffPolicy(ToyEnv(), num_envs=16, cfg=cfg, seed=0, print_log=False)
    trainer.state = trainer.init_state()
    rewards = []
    trainer.state, _ = trainer._collect_iter(trainer.state)
    for _ in range(80):
        trainer.state, m = trainer._train_iter(trainer.state)
        rewards.append(float(m["mean_reward"]))
    early, late = np.mean(rewards[:8]), np.mean(rewards[-8:])
    assert np.isfinite(rewards).all()
    assert late > early + 0.2, (early, late)


def test_sac_auto_alpha_moves_toward_target_entropy():
    """SAC v2 temperature (ent_coef: auto): log_alpha is a learned dual
    variable stepped toward target_entropy; it must move and stay finite."""
    import jax.numpy as jnp
    cfg = OffPolicyConfig(algo="sac", nsteps=8, noptepochs=1, nminibatches=2,
                          replay_size=64, batch_size=8, hidden_nodes=32,
                          hidden_layer=2, auto_alpha=True)
    trainer = OffPolicy(ToyEnv(), num_envs=16, cfg=cfg, seed=0, print_log=False)
    ts = trainer.init_state()
    a0 = float(jnp.exp(ts.params["alpha"]["log_alpha"]))
    assert a0 == pytest.approx(0.2, abs=1e-5)
    for _ in range(12):
        ts, _ = (trainer._train_iter(ts) if int(ts.replay.count) >= cfg.batch_size
                 else trainer._collect_iter(ts))
    a1 = float(jnp.exp(ts.params["alpha"]["log_alpha"]))
    assert np.isfinite(a1) and a1 != a0


def test_sac_auto_alpha_cfg_parsing():
    cfg = OffPolicyConfig.from_cfg_train(
        {"learn": {"ent_coef": "auto", "target_entropy": -4.0}}, "sac")
    assert cfg.auto_alpha and cfg.ent_coef == 0.2 and cfg.target_entropy == -4.0
