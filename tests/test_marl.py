"""MARL runner tests: shapes, HAPPO factor loop, learning on a toy team task."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner


@struct.dataclass
class _TeamState:
    pos: jnp.ndarray       # [N]
    progress: jnp.ndarray
    done: jnp.ndarray
    key: jnp.ndarray
    obs: jnp.ndarray
    reward: jnp.ndarray


class TeamEnv:
    """N agents each control a 1-D point; shared reward -mean(pos^2).
    Global obs = concat per-agent [pos, pos^2, 1, bias] blocks + tail [t, 1]."""
    num_agents = 3
    num_actions = 2
    num_ant_obs = 4
    num_obs = 3 * 4 + 2
    num_states = num_obs
    max_len = 16

    def _obs(self, pos, progress):
        blocks = jnp.stack([pos, pos * pos, jnp.ones(3), jnp.zeros(3)], axis=1).reshape(-1)
        tail = jnp.stack([progress.astype(jnp.float32) / self.max_len, jnp.ones(())])
        return jnp.concatenate([blocks, tail])

    def reset(self, key):
        key, sub = jax.random.split(key)
        pos = jax.random.uniform(sub, (3,), minval=-2.0, maxval=2.0)
        p = jnp.asarray(0, jnp.int32)
        return _TeamState(pos=pos, progress=p, done=jnp.asarray(False), key=key,
                          obs=self._obs(pos, p), reward=jnp.asarray(0.0))

    def step(self, state, flat_actions):
        actions = flat_actions.reshape(3, 2)
        key, sub = jax.random.split(state.key)
        fresh = jax.random.uniform(sub, (3,), minval=-2.0, maxval=2.0)
        moved = jnp.clip(state.pos + 0.2 * actions[:, 0], -3.0, 3.0)
        pos = jnp.where(state.done, fresh, moved)
        progress = jnp.where(state.done, 0, state.progress + 1)
        reward = -jnp.mean(pos * pos)
        done = progress >= self.max_len - 1
        return _TeamState(pos=pos, progress=progress, done=done, key=key,
                          obs=self._obs(pos, progress), reward=reward)


@pytest.mark.parametrize("algo", ["mappo", "ippo", "happo", "hatrpo"])
def test_marl_iteration_runs(algo):
    cfg = MarlConfig(algorithm_name=algo, episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    ts2, metrics = runner._train_iter(ts)
    assert np.isfinite(float(metrics["mean_reward"]))
    assert np.isfinite(float(metrics["value_loss"]))
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(ts.actor_params)[1]
    leaf1 = jax.tree_util.tree_leaves(ts2.actor_params)[1]
    assert not np.allclose(np.array(leaf0), np.array(leaf1))


@pytest.mark.slow
def test_mappo_learns_team_task():
    cfg = MarlConfig(algorithm_name="mappo", episode_length=8, ppo_epoch=3,
                     hidden_size=64, layer_n=1, lr=1e-3, critic_lr=1e-3)
    runner = MarlRunner(TeamEnv(), num_envs=32, cfg=cfg, seed=1, print_log=False)
    runner.state = runner.init_state()
    rewards = []
    for _ in range(80):
        runner.state, metrics = runner._train_iter(runner.state)
        rewards.append(float(metrics["mean_reward"]))
    early, late = np.mean(rewards[:8]), np.mean(rewards[-8:])
    assert np.isfinite(rewards).all()
    assert late > early + 0.2, (early, late)


@pytest.mark.parametrize("algo", ["mappo", "happo"])
def test_recurrent_marl_runs(algo):
    from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner
    cfg = MarlConfig(algorithm_name=algo, episode_length=4, ppo_epoch=2,
                     hidden_size=16, layer_n=1, use_recurrent_policy=True)
    runner = RecurrentMarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0,
                                 print_log=False)
    ts = runner.init_state()
    ts2, m = runner._train_iter(ts)
    assert np.isfinite(float(m["mean_reward"]))
    assert np.isfinite(float(m["value_loss"]))
    # hidden states evolve
    assert not np.allclose(np.array(ts2.actor_h), 0.0)


def test_episode_return_tracking():
    """ep_ret/last_ep_ret/ep_count mirror the reference's per-env episode
    reward accumulator (runner.py:145-163): TeamEnv episodes are exactly
    max_len steps of reward, recorded on done and reset to zero."""
    cfg = MarlConfig(algorithm_name="mappo", episode_length=8, ppo_epoch=1,
                     hidden_size=16, layer_n=1)
    env = TeamEnv()
    runner = MarlRunner(env, num_envs=4, cfg=cfg, seed=3, print_log=False)
    ts = runner.init_state()
    n_iters = 4  # 32 steps = 2 full episodes of 16
    for _ in range(n_iters):
        ts, m = runner._train_iter(ts)
    assert ts.ep_count.tolist() == [2, 2, 2, 2]
    assert np.isfinite(np.array(ts.last_ep_ret)).all()
    # accumulator was reset on done: running sum covers exactly 1 step since the
    # last done (episodes are 15 steps + 1 reset step), so it is bounded by one
    # step's reward range, -mean(pos^2) with pos in [-3,3]
    assert (np.array(ts.ep_ret) >= -9.0).all() and (np.array(ts.ep_ret) <= 0.0).all()
    assert float(m["episodes_done"]) == 4
    assert np.isclose(float(m["episode_rewards"]), float(np.mean(np.array(ts.last_ep_ret))))
