"""MultiIngenuity + MultiAntCircle env smoke/semantics tests."""
import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.envs.multi_ingenuity import MultiIngenuityEnv
from massive_marl_tpu.envs.multi_ant_circle import MultiAntCircleEnv


def test_ingenuity_shapes_and_hover():
    env = MultiIngenuityEnv()
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (52,)
    obs = np.array(state.obs).reshape(4, 13)
    assert np.allclose(obs[:, 0:3], [[0, 2, 1], [0, -2, 1], [0, 6, 1], [0, -6, 1]])
    # reward at spawn: dist to goal=4 -> pos ~ 4/17; up=5 each, spin=1 each
    st2 = jax.jit(env.step)(state, jnp.zeros(24))
    assert np.isfinite(float(st2.reward))
    assert float(st2.reward) > 0
    # strong symmetric vertical thrust on both rotors should climb (Mars g)
    acts = jnp.zeros((4, 6)).at[:, 2].set(1.0).at[:, 5].set(1.0).reshape(-1)
    st = state
    step = jax.jit(env.step)
    for _ in range(30):
        st = step(st, acts)
    z = np.array(st.pipeline.qpos[:, 2])
    assert (z > 1.0).all(), z


def test_ingenuity_die_reset():
    env = MultiIngenuityEnv()
    state = env.reset(jax.random.PRNGKey(0))
    # drop below 0.5 -> die
    pip = state.pipeline.replace(qpos=state.pipeline.qpos.at[0, 2].set(0.2))
    st = jax.jit(env.step)(state.replace(pipeline=pip), jnp.zeros(24))
    assert bool(st.done)


def test_ant_circle_shapes():
    env = MultiAntCircleEnv()
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (76,)
    per = np.array(state.obs).reshape(2, 38)
    assert abs(per[0, 0] - 3.0) < 0.05
    assert abs(per[1, 0] + 3.0) < 0.05
    st2 = jax.jit(env.step)(state, jnp.zeros(16))
    assert np.isfinite(float(st2.reward))
    assert np.isfinite(np.array(st2.obs)).all()
