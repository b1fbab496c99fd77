"""MultiIngenuity: 4 Mars coax-helicopters fly to per-agent goals under Mars
gravity.

Faithful re-derivation of /root/reference/agents/tasks/multi_ingenuity.py:
  * spawn (0, +-2, 1), (0, +-6, 1); goals (4, +-2, 1), (4, +-6, 1)
    (multi_ingenuity.py:157-164, 103-106); Mars gravity -3.721 (124-126)
  * actions 6/heli (24 total): per rotor a vertical thrust (clamped to
    +-2000, x dt) and 2 lateral fractions (clamped +-0.2); forces applied at
    the rotor bodies in LOCAL space (pre_physics_step, 268-339)
  * obs 13/heli = raw root state [pos3, quat4(xyzw), linvel3, angvel3]
    (compute_observations, 352-356)
  * reward = pos + pos*(up + spin) shaping, die if dist>8 or z<0.5
    (compute_ingenuity_reward, 382-452)
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.phys.maths import quat_rotate
from massive_marl_tpu.envs.base import EnvState, select_tree

SPAWNS = np.array([[0.0, 2.0, 1.0], [0.0, -2.0, 1.0], [0.0, 6.0, 1.0], [0.0, -6.0, 1.0]], np.float32)
GOALS = np.array([[4.0, 2.0, 1.0], [4.0, -2.0, 1.0], [4.0, 6.0, 1.0], [4.0, -6.0, 1.0]], np.float32)


@struct.dataclass
class HeliPipeline:
    qpos: jnp.ndarray  # [4, 7]
    qvel: jnp.ndarray  # [4, 6]


class MultiIngenuityEnv:
    num_agents = 4
    num_actions = 6
    num_ant_obs = 13     # per-agent obs block (root state)
    num_obs = 52
    num_states = 52

    def __init__(self, cfg: Dict[str, Any] | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        self.max_episode_length = env_cfg.get("episodeLength", 1000)
        sim_cfg = cfg.get("sim", {})
        self.dt = sim_cfg.get("dt", 0.0166)
        self.substeps = sim_cfg.get("substeps", 2)
        self.gravity = jnp.array([0.0, 0.0, -3.721])  # Mars (multi_ingenuity.py:124-126)

        model = mjcf.parse_mjcf(mjcf.asset_path("ingenuity.xml"))
        self.sys = model.system   # welded single body
        self.spawns = jnp.asarray(SPAWNS)
        self.goals = jnp.asarray(GOALS)
        self.thrust_limit = 2000.0
        self.lateral_limit = 0.2
        self.rotor_offsets = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.025]])

    def _fresh_pipeline(self) -> HeliPipeline:
        quat = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (4, 4))
        return HeliPipeline(qpos=jnp.concatenate([self.spawns, quat], axis=1),
                            qvel=jnp.zeros((4, 6)))

    def _obs(self, pipeline: HeliPipeline) -> jnp.ndarray:
        return jnp.concatenate([pipeline.qpos, pipeline.qvel], axis=1).reshape(-1)

    def _thrusts(self, actions):
        """[4,6] actions -> per-heli rotor forces [4,2,3] in body frame
        (pre_physics_step, multi_ingenuity.py:268-339; note the x dt scale)."""
        a = actions.reshape(4, 2, 3)   # [heli, rotor, (lat0, lat1, vert)]
        vert = jnp.clip(a[..., 2] * 2000.0, -self.thrust_limit, self.thrust_limit) * self.dt
        lat = jnp.clip(a[..., 0:2], -self.lateral_limit, self.lateral_limit)
        fz = vert
        fxy = vert[..., None] * lat
        return jnp.concatenate([fxy, fz[..., None]], axis=-1)  # [4,2,3]

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        sys = self.sys
        h = self.dt / self.substeps
        thrusts = self._thrusts(actions)

        def heli_substep(qpos, qvel, thrust):
            fk = engine.fwd_kinematics(sys, qpos, qvel)
            # rotor forces: local -> world, applied at rotor positions
            f0 = jnp.zeros(6)
            for r in range(2):
                f_w = quat_rotate(qpos[3:7], thrust[r])
                p_w = qpos[0:3] + quat_rotate(qpos[3:7], self.rotor_offsets[r])
                f0 = f0 + engine.point_force_spatial(p_w, f_w, fk.base)
            f_ext = [f0]
            qacc = engine.forward_dynamics(sys, fk, qvel, jnp.zeros(0), f_ext, self.gravity)
            return engine.integrate(sys, qpos, qvel, qacc, h)

        def substep(carry, _):
            qpos, qvel = carry
            qpos, qvel = jax.vmap(heli_substep)(qpos, qvel, thrusts)
            return (qpos, qvel), None

        (qpos, qvel), _ = jax.lax.scan(substep, (state.pipeline.qpos, state.pipeline.qvel),
                                       None, length=self.substeps)
        stepped = HeliPipeline(qpos=qpos, qvel=qvel)

        key = state.key
        pipeline = select_tree(state.done, self._fresh_pipeline(), stepped)
        progress = jnp.where(state.done, 0, state.progress + 1)

        obs = self._obs(pipeline)
        reward, done = self._reward(pipeline, progress)
        return EnvState(pipeline=pipeline, carry=state.carry, progress=progress,
                        done=done, key=key, obs=obs, reward=reward)

    def reset(self, key) -> EnvState:
        pipeline = self._fresh_pipeline()
        return EnvState(pipeline=pipeline, carry=jnp.zeros(()),
                        progress=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
                        key=key, obs=self._obs(pipeline), reward=jnp.asarray(0.0))

    def _reward(self, pipeline: HeliPipeline, progress):
        """compute_ingenuity_reward (multi_ingenuity.py:382-452)."""
        pos = pipeline.qpos[:, 0:3]
        quat = pipeline.qpos[:, 3:7]
        angvel_z = pipeline.qvel[:, 5]

        dist = jnp.sqrt(jnp.sum((self.goals - pos) ** 2, axis=-1))      # [4]
        pos_reward = jnp.sum(1.0 / (1.0 + dist * dist))

        ups = jax.vmap(lambda q: quat_rotate(q, jnp.array([0.0, 0.0, 1.0])))(quat)
        tilt = jnp.abs(1.0 - ups[:, 2])
        up_reward = jnp.sum(5.0 / (1.0 + tilt * tilt))

        spin = jnp.abs(angvel_z)
        spin_reward = jnp.sum(1.0 / (1.0 + spin * spin))

        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = jnp.any(dist > 8.0) | jnp.any(pos[:, 2] < 0.5)
        done = die | (progress >= self.max_episode_length - 1)
        return reward, done
