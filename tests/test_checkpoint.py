"""Async checkpointer round-trip + rotation + learning-curve regression."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from massive_marl_tpu.utils.checkpoint import AsyncCheckpointer, restore_latest


def test_async_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    ck = AsyncCheckpointer(d, keep=2)
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    for s in (1, 2, 3):
        ck.save(s, {**tree, "step": jnp.asarray(s)})
    ck.wait()
    restored, step = restore_latest(d, tree)
    assert step == 3
    assert int(restored["step"]) == 3
    np.testing.assert_array_equal(np.array(restored["w"]), np.arange(6).reshape(2, 3))
    # rotation kept only the last 2
    import glob, os
    assert len(glob.glob(os.path.join(d, "ckpt_*.ckpt"))) == 2
    ck.close()


def test_restore_latest_empty(tmp_path):
    restored, step = restore_latest(str(tmp_path), {"x": jnp.zeros(2)})
    assert restored is None and step is None


class _PointMassEnv:
    """1D double-integrator: move the point to the origin.  Reward = -x^2 -
    0.01*a^2; PPO must improve it within a few hundred gradient steps.  A
    deterministic analog of the golden-seed learning regression (SURVEY.md
    section 4 item 3) that isolates ALGORITHM correctness from physics-scale
    sample efficiency (OneAnt needs ~400 iterations to visibly improve)."""
    num_obs = 2
    num_actions = 1
    num_agents = 1
    num_states = 2

    def reset(self, key):
        from massive_marl_tpu.envs.base import EnvState
        key, sub = jax.random.split(key)
        x = jax.random.uniform(sub, (2,), minval=-1.0, maxval=1.0)
        return EnvState(pipeline=x, carry=None, progress=jnp.asarray(0, jnp.int32),
                        done=jnp.asarray(False), key=key, obs=x,
                        reward=jnp.asarray(0.0))

    def step(self, state, actions):
        from massive_marl_tpu.envs.base import EnvState
        key, sub = jax.random.split(state.key)
        fresh = jax.random.uniform(sub, (2,), minval=-1.0, maxval=1.0)
        x = jnp.where(state.done, fresh, state.pipeline)
        progress = jnp.where(state.done, 0, state.progress + 1)
        a = jnp.clip(actions[0], -1.0, 1.0)
        pos = x[0] + 0.1 * x[1]
        vel = x[1] + 0.1 * a
        nxt = jnp.stack([pos, vel])
        reward = -(pos ** 2) - 0.01 * (a ** 2)
        done = progress >= 63
        return EnvState(pipeline=nxt, carry=None, progress=progress, done=done,
                        key=key, obs=nxt, reward=reward)


@pytest.mark.slow
def test_ppo_learning_regression_pointmass():
    """PPO must improve a deterministic control task (golden seed)."""
    from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
    import jax as _jax
    env = _PointMassEnv()
    cfg = PPOConfig(nsteps=16, nminibatches=2, noptepochs=4, hidden=(32, 32),
                    lr=3e-3, gamma=0.99)
    ppo = PPO(env, num_envs=64, cfg=cfg, seed=0, print_log=False)
    ppo.state = ppo.init_state()
    rews = []
    for _ in range(60):
        ppo.state, m = ppo._train_iter(ppo.state)
        rews.append(float(m["mean_reward"]))
    assert np.isfinite(rews).all()
    first, last = np.mean(rews[:10]), np.mean(rews[-10:])
    assert last > first + 0.05, (first, last)


@pytest.mark.slow
def test_one_ant_ppo_smoke():
    """OneAnt+PPO end-to-end smoke: rewards stay finite, physics stays sane
    (stable substep regime), train state updates.  Long-horizon learning is
    validated offline (BASELINE.md: -1.4 -> +4.1 over 400 iterations)."""
    from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
    from massive_marl_tpu.envs.one_ant import OneAntEnv
    env = OneAntEnv({"sim": {"substeps": 6}})
    cfg = PPOConfig(nsteps=8, nminibatches=2, noptepochs=3, hidden=(64, 64),
                    lr=1e-3)
    ppo = PPO(env, num_envs=32, cfg=cfg, seed=0, print_log=False)
    ppo.state = ppo.init_state()
    rews = []
    for _ in range(10):
        ppo.state, m = ppo._train_iter(ppo.state)
        rews.append(float(m["mean_reward"]))
    assert np.isfinite(rews).all()
    # physics stays bounded under a learning policy (the envelope tightens to
    # ~1.5 m once the impulse contact solver is the default; the explicit
    # penalty model can briefly launch an ant under saturated torques)
    z = np.asarray(ppo.state.env_state.pipeline.ant_qpos[:, 0, 2])
    assert np.isfinite(z).all() and (z < 50.0).all(), z
