"""MultiAntCircle: 2 ants walk a radius-3 circle clockwise.

Re-derivation of /root/reference/agents/tasks/multi_ant_circle.py: ants spawn
at (+-3, 0, 1) (multi_ant_circle.py:210-213), per-ant obs 38 (same layout as
TenAnt), circle reward (compute_ant_reward, 415-509): +2 when moving
clockwise while inside the 2.7..3.3 radius band else -1 (per ant), plus
up-reward and energy/limit costs; death below z=0.31.

The reference kernel mixes torch and numpy (`np.linalg.norm` over the whole
batch, multi_ant_circle.py:438-446) - we implement the per-env semantics the
code plainly intends.  Note agent 2's position enters negated (pos_2 =
-obs_2[:, :2], multi_ant_circle.py:444), which we preserve.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from massive_marl_tpu.phys import mjcf
from massive_marl_tpu.envs import obs_math
from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, reset_scene, scene_step
from massive_marl_tpu.envs.base import EnvState, select_tree


@struct.dataclass
class CircleCarry:
    pos_before: jnp.ndarray  # [2,2] per-ant signed xy (agent 2 negated)


def _angle_deg(pos):
    """compute_angle (multi_ant_circle.py:400-413): 0..360 degrees, measured
    so that clockwise motion increases the angle for y<0."""
    a = jnp.abs(jnp.arctan2(pos[..., 1], pos[..., 0]) * 180.0 / jnp.pi)
    neg = pos[..., 1] < 0
    return jnp.where(neg, 360.0 - a, a)


class MultiAntCircleEnv:
    num_agents = 2
    num_actions = 8
    num_ant_obs = 38
    num_obs = 76
    num_states = 76

    def __init__(self, cfg: Dict[str, Any] | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        self.max_episode_length = env_cfg.get("episodeLength", 1000)
        self.dof_vel_scale = env_cfg.get("dofVelocityScale", 0.2)
        self.power_scale = env_cfg.get("powerScale", 1.0)
        self.heading_weight = env_cfg.get("headingWeight", 0.5)
        self.up_weight = env_cfg.get("upWeight", 0.1)
        self.actions_cost_scale = env_cfg.get("actionsCost", 0.005)
        self.energy_cost_scale = env_cfg.get("energyCost", 0.05)
        self.joints_at_limit_cost_scale = env_cfg.get("jointsAtLimitCost", 0.1)
        self.death_cost = env_cfg.get("deathCost", -2.0)
        self.termination_height = env_cfg.get("terminationHeight", 0.31)

        sim_cfg = cfg.get("sim", {})
        model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
        self.model = model
        plane_cfg = env_cfg.get("plane", {}) or {}
        self.spec = AntSceneSpec(
            ant_sys=model.system, box_sys=None, box_half_extents=None,
            num_ants=2, dt=sim_cfg.get("dt", 0.0166),
            substeps=sim_cfg.get("substeps", 3),
            power_scale=self.power_scale,
            plane_friction=float(plane_cfg.get("staticFriction", 1.0)),
            friction_combine=str(sim_cfg.get("friction_combine", "average")))
        self.init_hinge = jnp.asarray(model.init_hinge)
        self.targets = jnp.zeros(3)
        self.ant_start = jnp.array([[3.0, 0.0, 1.0], [-3.0, 0.0, 1.0]])

    def _signed_xy(self, pipeline: AntSceneState) -> jnp.ndarray:
        xy = pipeline.ant_qpos[:, 0:2]
        return xy * jnp.array([[1.0], [-1.0]])  # agent 2 negated (ref quirk)

    def _fresh_pipeline(self, key) -> AntSceneState:
        return reset_scene(self.spec, key, ant_start=self.ant_start,
                           box_start=None, init_hinge=self.init_hinge)

    def _obs(self, pipeline: AntSceneState, actions) -> jnp.ndarray:
        sys = self.spec.ant_sys
        per_ant = jax.vmap(
            lambda q, v, a: obs_math.ant_obs_38(
                q, v, a, self.targets, sys.jnt_range[:, 0], sys.jnt_range[:, 1],
                self.dof_vel_scale)
        )(pipeline.ant_qpos, pipeline.ant_qvel, actions.reshape(2, 8))
        return per_ant.reshape(-1)

    def reset(self, key) -> EnvState:
        key, sub = jax.random.split(key)
        pipeline = self._fresh_pipeline(sub)
        return EnvState(pipeline=pipeline,
                        carry=CircleCarry(pos_before=self._signed_xy(pipeline)),
                        progress=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
                        key=key, obs=self._obs(pipeline, jnp.zeros(16)),
                        reward=jnp.asarray(0.0))

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        actions = actions.reshape(2, 8)
        stepped = scene_step(self.spec, state.pipeline, actions)
        key, sub = jax.random.split(state.key)
        fresh = self._fresh_pipeline(sub)
        # failure containment: blown-up env -> forced reset (see ten_ant.py)
        blown = ~(jnp.isfinite(stepped.ant_qpos).all()
                  & jnp.isfinite(stepped.ant_qvel).all())
        reset_now = state.done | blown
        pipeline = select_tree(reset_now, fresh, stepped)
        carry_prev = select_tree(
            reset_now, CircleCarry(pos_before=self._signed_xy(fresh)), state.carry)
        progress = jnp.where(reset_now, 0, state.progress + 1)

        obs = self._obs(pipeline, actions)
        reward, done = self._reward(obs, actions, pipeline, carry_prev, progress)
        return EnvState(pipeline=pipeline,
                        carry=CircleCarry(pos_before=self._signed_xy(pipeline)),
                        progress=progress, done=done, key=key, obs=obs, reward=reward)

    def _reward(self, obs, actions, pipeline, carry: CircleCarry, progress):
        per_ant = obs.reshape(2, 38)
        pos = self._signed_xy(pipeline)                    # [2,2]
        dist = jnp.sqrt(jnp.sum(pos**2, axis=-1))
        angle = _angle_deg(pos)
        angle_before = _angle_deg(carry.pos_before)
        clockwise = (angle - angle_before) > 0
        on_circle = (dist >= 2.7) & (dist <= 3.3)
        good = (clockwise & on_circle).astype(jnp.float32)
        circle_rew = jnp.sum(good * 2.0 + (good - 1.0))

        up_reward = jnp.sum(jnp.where(per_ant[:, 12] > 0.93, self.up_weight, 0.0))
        actions_cost = jnp.sum(actions**2)
        electricity = jnp.sum(jnp.abs(actions * per_ant[:, 22:30]))
        at_limit = jnp.sum(per_ant[:, 14:22] > 0.99)

        total = (up_reward + circle_rew
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity
                 - self.joints_at_limit_cost_scale * at_limit)
        fallen = jnp.any(per_ant[:, 2] < self.termination_height)
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (progress >= self.max_episode_length - 1)
        return total, done
