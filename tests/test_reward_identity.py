"""Term-by-term reward identities against hand-computed values.

Each case constructs an explicit physics state with round-number geometry and
checks the task reward against a value derived BY HAND from the reference
formulas (TenAnt compute_ant_reward ten_ant.py:988-1301, OneAnt
compute_ant_reward one_ant.py:466-563, MultiIngenuity
compute_ingenuity_reward multi_ingenuity.py:382-452), so a sign or scale slip
cannot hide behind "the policy still learns" (VERDICT r1 item 7).
"""
import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.envs.ant_scene import AntSceneState
from massive_marl_tpu.envs.one_ant import OneAntCarry, OneAntEnv
from massive_marl_tpu.envs.ten_ant import GOAL_OFFSETS, TenAntCarry, TenAntEnv


def _mid_hinges(sys):
    """Hinge angles at range midpoints: every unscaled dof obs is exactly 0,
    so the joints-at-limit cost term is exactly zero."""
    r = np.asarray(sys.jnt_range)
    return jnp.asarray((r[:, 0] + r[:, 1]) / 2.0)


def _ant_qpos(xy, z, hinges):
    """[A,15] poses: identity base quat -> up_proj exactly 1 (> 0.93 gate)."""
    A = xy.shape[0]
    pos = jnp.concatenate([xy, jnp.full((A, 1), z)], axis=1)
    quat = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (A, 4))
    return jnp.concatenate([pos, quat, jnp.broadcast_to(hinges, (A, 8))], axis=1)


def test_ten_ant_reward_hand_computed():
    env = TenAntEnv()
    k = jnp.asarray(GOAL_OFFSETS)            # [10] goal-slot offsets

    # box at (4,0,1), identity quat: yaw 0 -> goal dir (sin 0, -cos 0)=(0,-1),
    # goal slots (4, -k_i) (compute_box_pos/other_goal, ten_ant.py:1354-1393)
    box_qpos = jnp.array([4.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0])
    # ants 2.0 m from their slots (outside the 1.5 m push gate)
    ant_xy = jnp.stack([jnp.full(10, 6.0), -k], axis=1)
    hinges = _mid_hinges(env.spec.ant_sys)
    pipeline = AntSceneState(
        ant_qpos=_ant_qpos(ant_xy, 0.6, hinges),
        ant_qvel=jnp.zeros((10, 14)),
        box_qpos=box_qpos, box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((10, 4, 6)))
    # previous step: ants were at distance 2.5 from slots at (4.5,-k_i)
    carry = TenAntCarry(
        pos_before=jnp.stack([jnp.full(10, 7.0), -k], axis=1),
        goal_before=jnp.stack([jnp.full(10, 4.5), -k], axis=1))
    actions = jnp.full((10, 8), 0.1)
    obs = env._obs(pipeline, actions)
    reward, done = env._reward(obs, actions, pipeline, carry, jnp.asarray(5))

    # hand computation from the reference equations:
    #   alive                = 5                      (ten_ant.py:1281)
    #   up   = 10 ants upright * 0.1, summed, x10 = 10 (ten_ant.py:1240-1246)
    #   quat = 0 * 1.0 (quat_reward_scale=0, ten_ant.py:56-60)
    #   ant_dist   = 500 * (2.5 - 2.0) * 10 ants = 2500 (ten_ant.py:1080-1090)
    #   goal slots: |(0,-k)-(4,-k)| = 4, before |(0,-k)-(4.5,-k)| = 4.5
    #   goal_dist  = 500 * (4.5 - 4.0) * 10 = 2500
    #   goal_arrive (4 > 0.5) = 0; success (prod arrive = 0) = 0
    #   actions_cost = 0.005 * sum(0.1^2)*80 = 0.005 * 0.8 = 0.004
    #   electricity (dof_vel=0) = 0; joints-at-limit (mid-range) = 0
    expected = 5.0 + 10.0 + 2500.0 + 2500.0 - 0.004
    np.testing.assert_allclose(float(reward), expected, rtol=1e-5)
    assert not bool(done)

    # goal-arrive + success gates: put every slot within 0.5 of its target
    # (box at the origin) -> +2 per slot and the x100 success bonus
    box_home = jnp.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0])
    pipeline2 = pipeline.replace(box_qpos=box_home)
    carry2 = TenAntCarry(pos_before=carry.pos_before,
                         goal_before=jnp.stack([jnp.zeros(10), -k], axis=1))
    ant_xy2 = jnp.stack([jnp.full(10, 2.0), -k], axis=1)   # 2 m from slots
    pipeline2 = pipeline2.replace(ant_qpos=_ant_qpos(ant_xy2, 0.6, hinges))
    carry2 = carry2.replace(pos_before=jnp.stack([jnp.full(10, 2.0), -k], axis=1))
    obs2 = env._obs(pipeline2, actions)
    reward2, done2 = env._reward(obs2, actions, pipeline2, carry2, jnp.asarray(5))
    #   goal_dist = 0 -> arrive all -> +2*10; success = 1*100 (quat_dist=1>0.9)
    #   ant_dist delta = 0; up 10; alive 5
    expected2 = 5.0 + 10.0 + 20.0 + 100.0 - 0.004
    np.testing.assert_allclose(float(reward2), expected2, rtol=1e-5)

    # death: ANY ant below terminationHeight 0.31 -> flat -2, done
    # (ten_ant.py:1290-1298)
    low = pipeline.ant_qpos.at[3, 2].set(0.2)
    obs3 = env._obs(pipeline.replace(ant_qpos=low), actions)
    reward3, done3 = env._reward(obs3, actions, pipeline.replace(ant_qpos=low),
                                 carry, jnp.asarray(5))
    np.testing.assert_allclose(float(reward3), -2.0, rtol=1e-6)
    assert bool(done3)

    # timeout: done at progress >= episodeLength - 1 with the normal reward
    reward4, done4 = env._reward(obs, actions, pipeline, carry,
                                 jnp.asarray(env.max_episode_length - 1))
    np.testing.assert_allclose(float(reward4), expected, rtol=1e-5)
    assert bool(done4)


def test_one_ant_reward_hand_computed():
    env = OneAntEnv()
    hinges = _mid_hinges(env.spec.ant_sys)
    # ant at (-8,0,0.6), box at (-4,0,1): 4 m apart (outside the 1.5 m gate)
    pipeline = AntSceneState(
        ant_qpos=_ant_qpos(jnp.array([[-8.0, 0.0]]), 0.6, hinges),
        ant_qvel=jnp.zeros((1, 14)),
        box_qpos=jnp.array([-4.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]),
        box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((1, 4, 6)))
    carry = OneAntCarry(pos_before=jnp.array([-9.0, 0.0]),
                        box_before=jnp.array([-4.5, 0.0]))
    actions = jnp.full(8, 0.1)
    obs = env._obs(pipeline, actions)
    reward, done = env._reward(obs, actions, pipeline, carry, jnp.asarray(5))

    #   alive 0.5 (one_ant.py:541); up 0.1 (obs[10]=1 > 0.93, one_ant.py:529)
    #   quat = 1.0 * 1.0 (identity box quat, quat_reward_scale=1)
    #   ant_dist  = 500 * (|-9 - -4.5| - |-8 - -4|) = 500*(4.5-4) = 250
    #   goal_dist = 500 * (4.5 - 4.0) = 250 (box target = origin)
    #   arrive (4 > 0.5) = 0, success = 0
    #   actions_cost = 0.005 * 0.08 = 0.0004; electricity 0; limit 0
    expected = 0.5 + 0.1 + 1.0 + 250.0 + 250.0 - 0.0004
    np.testing.assert_allclose(float(reward), expected, rtol=1e-5)
    assert not bool(done)

    # arrive + success: box within 0.5 of the origin, quat aligned
    #   -> +2 arrive, +10 success (one_ant.py:515-519)
    pipeline2 = pipeline.replace(
        box_qpos=jnp.array([0.2, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]))
    carry2 = OneAntCarry(pos_before=jnp.array([-8.0, 0.0]),
                         box_before=jnp.array([0.2, 0.0]))
    # keep ant 4m from the NEW box position so the gates don't change terms:
    # ant at (-8,0): |(-8,0)-(0.2,0)| = 8.2 -> before must also be 8.2
    carry2 = carry2.replace(pos_before=jnp.array([-8.0, 0.0]))
    obs2 = env._obs(pipeline2, actions)
    reward2, done2 = env._reward(obs2, actions, pipeline2, carry2, jnp.asarray(5))
    expected2 = 0.5 + 0.1 + 1.0 + 0.0 + 0.0 + 2.0 + 10.0 - 0.0004
    np.testing.assert_allclose(float(reward2), expected2, rtol=1e-5)

    # death below 0.31 (obs[0] is the torso z)
    low = pipeline.ant_qpos.at[0, 2].set(0.25)
    obs3 = env._obs(pipeline.replace(ant_qpos=low), actions)
    reward3, done3 = env._reward(obs3, actions, pipeline.replace(ant_qpos=low),
                                 carry, jnp.asarray(5))
    np.testing.assert_allclose(float(reward3), -2.0, rtol=1e-6)
    assert bool(done3)


def test_electricity_and_limit_costs():
    """The two obs-coupled costs with non-zero hand values: electricity uses
    |action * scaled dof velocity| (ten_ant.py:1249-1259 via obs 22:30) and
    the limit cost counts scaled dof positions > 0.99 (ten_ant.py:1262-1272)."""
    env = TenAntEnv()
    k = jnp.asarray(GOAL_OFFSETS)
    r = np.asarray(env.spec.ant_sys.jnt_range)
    hinges = jnp.asarray(r[:, 1])            # every hinge AT its upper limit
    ant_xy = jnp.stack([jnp.full(10, 6.0), -k], axis=1)
    dofvel = jnp.ones(8) * 2.0               # obs dof-vel block = 2*0.2 = 0.4
    pipeline = AntSceneState(
        ant_qpos=_ant_qpos(ant_xy, 0.6, hinges),
        ant_qvel=jnp.zeros((10, 14)).at[:, 6:].set(dofvel),
        box_qpos=jnp.array([4.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]),
        box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((10, 4, 6)))
    carry = TenAntCarry(pos_before=ant_xy,
                        goal_before=jnp.stack([jnp.full(10, 4.0), -k], axis=1))
    actions = jnp.full((10, 8), 0.5)
    obs = env._obs(pipeline, actions)
    reward, _ = env._reward(obs, actions, pipeline, carry, jnp.asarray(5))
    # unscale(upper) = +1 for every dof -> limit cost = 80 dofs * 0.1 = 8
    # electricity  = 0.05 * sum(|0.5 * 0.4|) over 80 dofs = 0.05*16 = 0.8
    # actions_cost = 0.005 * 0.25 * 80 = 0.1
    # up 10, alive 5, distances static -> 0
    expected = 5.0 + 10.0 - 8.0 - 0.8 - 0.1
    np.testing.assert_allclose(float(reward), expected, rtol=1e-5)


def test_multi_ingenuity_reward_hand_computed():
    from massive_marl_tpu.envs.multi_ingenuity import HeliPipeline, MultiIngenuityEnv
    env = MultiIngenuityEnv()
    # each heli exactly 1 m short of its goal, upright, no spin:
    #   pos_reward  = 4 * 1/(1+1) = 2
    #   up_reward   = 4 * 5/(1+0) = 20 ; spin_reward = 4 * 1/(1+0) = 4
    #   reward = pos + pos*(up + spin) = 2 + 2*24 = 50
    pos = env.goals - jnp.array([1.0, 0.0, 0.0])
    quat = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (4, 4))
    pipeline = HeliPipeline(qpos=jnp.concatenate([pos, quat], axis=1),
                            qvel=jnp.zeros((4, 6)))
    reward, done = env._reward(pipeline, jnp.asarray(5))
    np.testing.assert_allclose(float(reward), 50.0, rtol=1e-6)
    assert not bool(done)

    # die: any heli > 8 m from its goal or below z=0.5
    far = pos.at[2, 0].add(-9.0)
    r2, d2 = env._reward(HeliPipeline(qpos=jnp.concatenate([far, quat], axis=1),
                                      qvel=jnp.zeros((4, 6))), jnp.asarray(5))
    assert bool(d2)
    low = pos.at[1, 2].set(0.4)
    _, d3 = env._reward(HeliPipeline(qpos=jnp.concatenate([low, quat], axis=1),
                                     qvel=jnp.zeros((4, 6))), jnp.asarray(5))
    assert bool(d3)
