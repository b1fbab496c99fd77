"""Env semantics tests (SURVEY.md section 4, item 2): obs layouts, reward
identities, reset rules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.envs.one_ant import OneAntEnv
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.wrap.vec_task import split_multi_agent_obs


@pytest.fixture(scope="module")
def one_ant():
    return OneAntEnv()


def rollout(env, n_steps, n_act, key=0, scale=1.0):
    """jitted scan rollout with random actions; returns stacked states."""
    k = jax.random.PRNGKey(key)
    state = env.reset(k)

    def step(carry, k):
        st = env.step(carry, scale * jax.random.uniform(k, (n_act,), minval=-1, maxval=1))
        return st, (st.obs, st.reward, st.done, st.progress)

    keys = jax.random.split(jax.random.PRNGKey(key + 1), n_steps)
    state, traj = jax.jit(lambda s: jax.lax.scan(step, s, keys))(state)
    return state, traj


def test_one_ant_shapes_and_finite(one_ant):
    env = one_ant
    state, (obs, rew, done, prog) = rollout(env, 30, 8)
    assert obs.shape == (30, 60)
    assert np.isfinite(np.array(obs)).all()
    assert np.isfinite(np.array(rew)).all()


def test_one_ant_obs_layout(one_ant):
    env = one_ant
    state = env.reset(jax.random.PRNGKey(3))
    obs = np.array(state.obs)
    # z close to spawn height 1.0
    assert 0.8 < obs[0] <= 1.05
    # up_proj ~ 1 (spawn upright), heading_proj towards origin from (-6,0) = +x
    assert obs[10] > 0.95
    assert obs[11] > 0.9
    # actions block zero at reset
    assert np.allclose(obs[52:60], 0.0)
    # dof_pos_scaled in [-1, 1]
    assert (np.abs(obs[12:20]) <= 1.0 + 1e-5).all()


def test_one_ant_alive_reward_near_reset(one_ant):
    """First step with zero actions: reward ~ alive(0.5) + up(0.1) + quat
    + small deltas; definitely positive and < 10."""
    env = one_ant
    state = env.reset(jax.random.PRNGKey(0))
    st2 = jax.jit(env.step)(state, jnp.zeros(8))
    r = float(st2.reward)
    assert 0.0 < r < 10.0, r


def test_one_ant_death_semantics(one_ant):
    """The fallen predicate and death reward, tested directly on the reward
    function (the contact spring legitimately bounces a teleported ant, so we
    don't fight the physics here)."""
    env = one_ant
    state = env.reset(jax.random.PRNGKey(1))
    obs_fallen = state.obs.at[0].set(0.30)  # below terminationHeight 0.31
    reward, done = jax.jit(env._reward)(obs_fallen, jnp.zeros(8), state.pipeline,
                                        state.carry, state.progress)
    assert bool(done)
    assert float(reward) == pytest.approx(env.death_cost)


def test_one_ant_timeout_autoreset(one_ant):
    """progress >= episodeLength-1 -> done; the following step restarts the
    episode from a fresh spawn (reference auto-reset order, ten_ant.py:894-901)."""
    env = one_ant
    state = env.reset(jax.random.PRNGKey(1))
    state = state.replace(progress=jnp.asarray(env.max_episode_length - 2, jnp.int32))
    st2 = jax.jit(env.step)(state, jnp.zeros(8))
    assert bool(st2.done)
    st3 = jax.jit(env.step)(st2, jnp.zeros(8))
    assert int(st3.progress) == 0
    assert float(st3.obs[0]) > 0.8  # respawned at z=1
    assert not bool(st3.done)
    # fresh episode: ant back at spawn x=-6
    assert abs(float(st3.pipeline.ant_qpos[0, 0]) + 6.0) < 0.1


def test_ten_ant_shapes():
    env = TenAntEnv()
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (388,)
    obs = np.array(state.obs)
    per_ant = obs[:380].reshape(10, 38)
    # torso positions at spawn columns x=6, y=+-1.5...
    assert np.allclose(per_ant[:, 0], 6.0, atol=0.05)
    assert np.allclose(np.sort(per_ant[:, 1]), np.sort(
        [-1.5, 1.5, -4.5, 4.5, -7.5, 7.5, -10.5, 10.5, -13.5, 13.5]), atol=0.05)
    # box tail: pos (4,0), identity quat, targets (0,0)
    assert np.allclose(obs[380:382], [4.0, 0.0], atol=1e-5)
    assert np.allclose(obs[382:386], [0, 0, 0, 1], atol=1e-5)
    st2 = jax.jit(env.step)(state, jnp.zeros(80))
    assert np.isfinite(np.array(st2.obs)).all()
    assert np.isfinite(float(st2.reward))


def test_ten_ant_goal_slots_identity_yaw():
    env = TenAntEnv()
    state = env.reset(jax.random.PRNGKey(0))
    goals = np.array(env._goals(state.pipeline.box_qpos))
    # identity quat -> dir = (sin 0, -cos 0) = (0,-1); goal_i = (4, -k_i)
    expect = np.stack([np.full(10, 4.0), -np.array(
        [1.5, -1.5, 4.5, -4.5, 7.5, -7.5, 10.5, -10.5, 13.5, -13.5])], axis=1)
    assert np.allclose(goals, expect, atol=1e-5)


def test_multi_agent_split():
    obs_buf = jnp.arange(2 * 388, dtype=jnp.float32).reshape(2, 388)
    per = split_multi_agent_obs(obs_buf, 10, 38)
    assert per.shape == (2, 10, 46)
    np.testing.assert_allclose(np.array(per[0, 3, :38]), np.arange(3 * 38, 4 * 38))
    np.testing.assert_allclose(np.array(per[1, 0, 38:]), np.arange(388 + 380, 388 + 388))


def test_wrappers_step_before_reset():
    """step() before reset() must work: in the reference the sim buffers
    exist from construction (base_task.py:56-68), so trainers/users may step
    immediately (e.g. ppo.py evaluation loops)."""
    import massive_marl_tpu
    env = massive_marl_tpu.make("TenAnt", "mappo", num_envs=2)
    obs, share, rew, done, infos, _ = env.step(
        [np.zeros((2, 8), np.float32) for _ in range(10)])
    assert np.asarray(obs).shape == (2, 10, 46)
    assert np.asarray(share).shape == (2, 10, 388)
    assert np.asarray(rew).shape == (2, 10, 1)
    assert np.isfinite(np.asarray(obs)).all()

    env2 = massive_marl_tpu.make("OneAnt", "ppo", num_envs=2)
    o, r, d, _ = env2.step(np.zeros((2, 8), np.float32))
    assert np.asarray(o).shape == (2, 60)
    assert np.isfinite(np.asarray(r)).all()


def test_domain_randomization():
    import yaml, os
    from massive_marl_tpu.utils.config import CFG_ROOT
    with open(os.path.join(CFG_ROOT, "OneAnt.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["task"]["randomize"] = True
    env = OneAntEnv(cfg)
    s1 = env.reset(jax.random.PRNGKey(0))
    s2 = env.reset(jax.random.PRNGKey(1))
    # randomized masses differ between envs and from the nominal system
    m1 = np.array(s1.pipeline.dr.mass)   # [A=1, nb]
    m2 = np.array(s2.pipeline.dr.mass)
    m0 = np.array(env.spec.ant_sys.mass)
    assert not np.allclose(m1, m2)
    assert not np.allclose(m1[0], m0)
    assert (m1 > 0.5 * m0 - 1e-6).all() and (m1 < 1.5 * m0 + 1e-6).all()
    # stepping works with the randomized parameters
    st = jax.jit(env.step)(s1, jnp.zeros(8))
    assert np.isfinite(np.array(st.obs)).all()
    # frequency gating: OneAnt.yaml frequency=600 means an env that dies
    # early keeps its sample (randomize_buf semantics, base_task.py:228-233);
    # mass is setup_only so it persists across re-randomizations regardless
    assert env.dr_frequency >= 1
    assert env._dr_mass_setup_only == bool(
        cfg["task"]["randomization_params"]["actor_params"]["ant"]
        ["rigid_body_properties"]["mass"].get("setup_only", False))
    done_state = st.replace(done=jnp.asarray(True))
    st2 = jax.jit(env.step)(done_state, jnp.zeros(8))
    # after an auto-reset before `frequency` steps, the DR sample is kept
    np.testing.assert_allclose(np.array(st2.pipeline.dr.damping),
                               np.array(s1.pipeline.dr.damping), rtol=1e-6)
    np.testing.assert_allclose(np.array(st2.pipeline.dr.mass), m1, rtol=1e-6)


def test_foot_sensor_torque_channels_live():
    """The 24 foot-sensor obs dims (one_ant.py:610-614) carry a full wrench:
    both the force AND torque triplets must be non-degenerate once the ant
    stands (round 1 hard-zeroed the torque half; VERDICT r1 item 8 - the
    IsaacGym sensor at the foot origin reports the contact moment too)."""
    env = OneAntEnv({"sim": {"substeps": 3}})
    st = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(60):
        st = step(st, jnp.zeros(8))
    sens = np.asarray(st.pipeline.sensors)        # [1, 4, 6]
    forces, torques = sens[0, :, 0:3], sens[0, :, 3:6]
    assert np.abs(forces).max() > 1e-3, "feet should carry contact force at rest"
    assert np.abs(torques).max() > 1e-5, "contact moment about the sensor origin"
    # and they flow into the obs block (indices 28:52, 6 per sensor)
    obs = np.asarray(st.obs)
    wrench_obs = obs[28:52].reshape(4, 6)
    np.testing.assert_allclose(wrench_obs, sens[0] * env.contact_force_scale,
                               rtol=1e-5, atol=1e-6)
