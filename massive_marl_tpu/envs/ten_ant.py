"""TenAnt (the benchmark's north-star task): 10 ants cooperatively push a
1x28x1 frictionless box (mass 28) so that per-ant goal slots on the box's
long axis reach their targets.

Faithful re-derivation of /root/reference/agents/tasks/ten_ant.py:
  * scene: ants spawn in two columns at x=6, y=+-1.5..+-13.5, z=1
    (ten_ant.py:339-360); box at (4, 0, 1) (ten_ant.py:490-494)
  * goal slots: box_pos + k_i * (sin a, -cos a) with a the box yaw and
    k = [1.5,-1.5,4.5,-4.5,...,13.5,-13.5] (compute_box_pos/compute_other_goal,
    ten_ant.py:1354-1393); targets at (0, -k_i) (ten_ant.py:171-183)
  * obs: 10 x 38 per-ant blocks + [box_pos2, box_quat4, box_targets2] = 388
    (compute_observations, ten_ant.py:712-808); the agent axis is a tensor
    dim here instead of the reference's unrolled _1.._10 attributes
  * shared team reward: compute_ant_reward (ten_ant.py:988-1301)
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

# per-ant goal-slot offsets along the box axis (ten_ant.py:1354-1393)
GOAL_OFFSETS = np.array([1.5, -1.5, 4.5, -4.5, 7.5, -7.5, 10.5, -10.5, 13.5, -13.5], np.float32)
SPAWN_Y = np.array([-1.5, 1.5, -4.5, 4.5, -7.5, 7.5, -10.5, 10.5, -13.5, 13.5], np.float32)


@struct.dataclass
class TenAntCarry:
    pos_before: jnp.ndarray    # [10,2] ant xy
    goal_before: jnp.ndarray   # [10,2] goal slots


class TenAntEnv:
    num_agents = 10
    num_actions = 8            # per agent; 80 joint (ten_ant.py:61-67)
    num_ant_obs = 38
    num_obs = 388              # global obs_buf
    num_states = 388

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
        # fixed in the task class (ten_ant.py:56-60)
        self.quat_reward_scale = 0.0
        self.ant_dist_reward_scale = 500.0
        self.goal_dist_reward_scale = 500.0

        sim_cfg = cfg.get("sim", {})
        dt = sim_cfg.get("dt", 0.0166)
        substeps = sim_cfg.get("substeps", 3)
        # ground-plane material friction (reference _create_ground_plane,
        # base_task.py:233-238; TenAnt.yaml plane.staticFriction) and the
        # pairwise combine rule (AntSceneSpec.friction_combine)
        plane_cfg = env_cfg.get("plane", {}) or {}
        plane_friction = float(plane_cfg.get("staticFriction", 1.0))
        friction_combine = str(sim_cfg.get("friction_combine", "average"))
        # probe knob (BASELINE.md r5 peak attribution): force the ant-box
        # PAIR friction, leaving every other pair under friction_combine
        abm = sim_cfg.get("ant_box_friction", None)
        ant_box_mu = None if abm is None else float(abm)
        # second probe knob: force the box-ground PAIR friction only
        bgm = sim_cfg.get("box_ground_friction", None)
        box_ground_mu = None if bgm is None else float(bgm)
        # contact-constant overrides (sweeps/sensitivity studies; keys are
        # engine.ContactParams fields, e.g. hc_cap - BASELINE.md r5 impact
        # study).  Default: the MuJoCo-tuned shipped constants.
        from massive_marl_tpu.phys.engine import ContactParams as _CP
        contact = _CP(**(sim_cfg.get("contact", {}) or {}))
        # fused Pallas physics substep (ops/fused_substep.py).  DR composes
        # with it: the randomized per-ant parameters travel as a batched
        # kernel operand (no per-env constant baking).
        # "auto" (default): on when running on TPU hardware, off elsewhere
        # (the pallas interpreter on CPU is only for the agreement tests)
        fused = sim_cfg.get("fused_kernel", "auto")
        if fused == "auto":
            fused = jax.default_backend() in ("tpu", "axon")
        self.use_fused = bool(fused)

        # domain randomization (base_task.py:216-410; spec TenAnt.yaml:84-121)
        from massive_marl_tpu.phys import dr as _dr
        task_cfg = cfg.get("task", {})
        self.randomize = bool(task_cfg.get("randomize", False))
        rp = task_cfg.get("randomization_params", {}) or {}
        dr_spec = (rp.get("actor_params", {}) or {}).get("ant") if self.randomize else None
        # re-randomization frequency in env steps (base_task.py:218,228-233)
        self.dr_frequency = int(rp.get("frequency", 1))
        rb = (dr_spec or {}).get("rigid_body_properties", {})
        self._dr_mass_setup_only = bool(rb.get("mass", {}).get("setup_only", False))
        self._obs_noise = _dr.noise_fn(rp.get("observations") if self.randomize else None)
        self._act_noise = _dr.noise_fn(rp.get("actions") if self.randomize else None)

        model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
        self.model = model
        self.spec = AntSceneSpec(
            ant_sys=model.system,
            box_sys=mjcf.make_box_system((0.5, 14.0, 0.5), density=1.0, friction=0.0),
            box_half_extents=(0.5, 14.0, 0.5),
            num_ants=10,
            dt=dt,
            substeps=substeps,
            power_scale=self.power_scale,
            plane_friction=plane_friction,
            friction_combine=friction_combine,
            ant_box_mu=ant_box_mu,
            box_ground_mu=box_ground_mu,
            contact=contact,
            dr_spec=dr_spec,
        )
        self.init_hinge = jnp.asarray(model.init_hinge)
        self.targets = jnp.zeros(3)
        self.offsets = jnp.asarray(GOAL_OFFSETS)
        self.box_targets_i = jnp.stack([jnp.zeros(10), -self.offsets], axis=1)  # [10,2]
        self.box_targets = jnp.zeros(2)
        self.ant_start = jnp.concatenate([
            jnp.full((10, 1), 6.0), jnp.asarray(SPAWN_Y)[:, None], jnp.ones((10, 1))], axis=1)

    def _goals(self, box_qpos) -> jnp.ndarray:
        """[10,2] goal slots from the box pose (ten_ant.py:1354-1393)."""
        d = obs_math.box_yaw_goal_dir(box_qpos[3:7])
        return box_qpos[0:2] + self.offsets[:, None] * d

    def _fresh_pipeline(self, key, frame=None) -> AntSceneState:
        return reset_scene(self.spec, key, ant_start=self.ant_start,
                           box_start=jnp.array([4.0, 0.0, 1.0]),
                           init_hinge=self.init_hinge, frame=frame)

    def _dr_reset(self, fresh: AntSceneState, stepped: AntSceneState,
                  prev: AntSceneState) -> AntSceneState:
        """DR bookkeeping for a fresh episode: re-sample only when the env
        has lived >= frequency steps since its last randomization
        (randomize_buf gating, base_task.py:228-233); setup_only properties
        (mass, TenAnt.yaml:101-106) keep their first-reset values."""
        if not self.randomize:
            return fresh
        resample = stepped.dr_count >= self.dr_frequency
        new_dr = select_tree(resample, fresh.dr, prev.dr)
        if self._dr_mass_setup_only:
            new_dr = new_dr.replace(mass=prev.dr.mass)
        return fresh.replace(dr=new_dr,
                             dr_count=jnp.where(resample, 0, stepped.dr_count),
                             # correlated-noise sample persists until the next
                             # re-randomization (base_task.py:281-288)
                             corr_key=select_tree(resample, fresh.corr_key,
                                                  prev.corr_key))

    def _carry_of(self, pipeline: AntSceneState) -> TenAntCarry:
        return TenAntCarry(pos_before=pipeline.ant_qpos[:, 0:2],
                           goal_before=self._goals(pipeline.box_qpos))

    def _obs(self, pipeline: AntSceneState, actions) -> jnp.ndarray:
        """actions: [10,8].  Returns the flat 388-dim global obs_buf."""
        sys = self.spec.ant_sys
        per_ant = jax.vmap(
            lambda q, v, a: obs_math.ant_obs_38(
                q, v, a, self.targets, sys.jnt_range[:, 0], sys.jnt_range[:, 1],
                self.dof_vel_scale)
        )(pipeline.ant_qpos, pipeline.ant_qvel, actions)  # [10,38]
        return jnp.concatenate([
            per_ant.reshape(-1), pipeline.box_qpos[0:2], pipeline.box_qpos[3:7],
            self.box_targets])

    def reset(self, key) -> EnvState:
        key, sub = jax.random.split(key)
        pipeline = self._fresh_pipeline(sub)
        obs = self._obs(pipeline, jnp.zeros((10, 8)))
        return EnvState(pipeline=pipeline, carry=self._carry_of(pipeline),
                        progress=jnp.asarray(0, jnp.int32),
                        done=jnp.asarray(False), key=key, obs=obs,
                        reward=jnp.asarray(0.0))

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """actions: flat [80] (joint-action layout, ten_ant.py:886-891)."""
        actions = actions.reshape(10, 8)
        key, kn_a, kn_o = jax.random.split(state.key, 3)
        applied = self._act_noise(kn_a, actions, state.pipeline.frame,
                                  jax.random.fold_in(state.pipeline.corr_key, 0))
        stepped = scene_step(self.spec, state.pipeline, applied)
        return self._finish_step(stepped, actions, key, kn_o, state)

    def step_batch(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Batched step: state has a leading env axis, actions [E, 80].

        Default path is exactly jax.vmap(self.step); with cfg
        `sim.fused_kernel: true` the physics substeps run as one Pallas
        kernel over the flattened E*10 articulation batch
        (ops/fused_substep.py) while obs/reward/reset stay vmapped."""
        if not self.use_fused:
            return jax.vmap(self.step)(state, actions)
        from massive_marl_tpu.ops.fused_substep import fused_scene_step
        E = actions.shape[0]
        actions = actions.reshape(E, 10, 8)
        triple = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)
        key, kn_a, kn_o = triple[:, 0], triple[:, 1], triple[:, 2]
        applied = jax.vmap(self._act_noise)(
            kn_a, actions, state.pipeline.frame,
            jax.vmap(lambda k: jax.random.fold_in(k, 0))(state.pipeline.corr_key))
        stepped = fused_scene_step(self.spec, state.pipeline, applied)
        return jax.vmap(self._finish_step)(stepped, actions, key, kn_o, state)

    def _finish_step(self, stepped: AntSceneState, actions: jnp.ndarray,
                     key: jnp.ndarray, kn_o: jnp.ndarray, state: EnvState) -> EnvState:
        """Everything after the physics: blowup containment, auto-reset
        overwrite, obs, reward (base_task.py:129-149 step order)."""
        key, sub = jax.random.split(key)
        fresh = self._dr_reset(self._fresh_pipeline(sub, frame=stepped.frame),
                               stepped, state.pipeline)
        # failure containment: a blown-up env (f32 overflow under adversarial
        # torques) is treated as done and replaced by a fresh episode so NaNs
        # never reach the learner (SURVEY.md section 5 failure detection)
        blown = ~(jnp.isfinite(stepped.ant_qpos).all() & jnp.isfinite(stepped.ant_qvel).all() & jnp.isfinite(stepped.box_qpos).all() & jnp.isfinite(stepped.box_qvel).all())
        reset_now = state.done | blown
        pipeline = select_tree(reset_now, fresh, stepped)
        carry_prev = select_tree(reset_now, self._carry_of(fresh), state.carry)
        progress = jnp.where(reset_now, 0, state.progress + 1)

        # reward from the CLEAN obs; DR noise touches only the returned obs
        # (reference order: compute_reward inside post_physics_step, noise
        # applied afterwards in BaseTask.step, base_task.py:139-149)
        obs = self._obs(pipeline, actions)
        reward, done = self._reward(obs, actions, pipeline, carry_prev, progress)
        obs = self._obs_noise(kn_o, obs, pipeline.frame,
                              jax.random.fold_in(pipeline.corr_key, 1))
        return EnvState(pipeline=pipeline, carry=self._carry_of(pipeline),
                        progress=progress, done=done, key=key, obs=obs,
                        reward=reward)

    def _reward(self, obs, actions, pipeline: AntSceneState, carry: TenAntCarry, progress):
        """Shared team reward, compute_ant_reward (ten_ant.py:988-1301)."""
        per_ant = obs[: 10 * 38].reshape(10, 38)
        box_quat = pipeline.box_qpos[3:7]
        goals = self._goals(pipeline.box_qpos)             # [10,2]

        quat_dist = obs_math.box_quat_alignment(box_quat)
        quat_reward = self.quat_reward_scale * quat_dist

        ant_xy = per_ant[:, 0:2]
        ant_push = 1.0 - (obs_math.l2_xy(ant_xy, goals) < 1.5)          # [10]
        ant_dist = obs_math.l2_xy(carry.pos_before, carry.goal_before) - obs_math.l2_xy(ant_xy, goals)
        ant_dist_reward = jnp.sum(self.ant_dist_reward_scale * ant_dist * ant_push)

        goal_dist_before = obs_math.l2_xy(self.box_targets_i, carry.goal_before)
        goal_dist = obs_math.l2_xy(self.box_targets_i, goals)
        goal_arrive = (goal_dist < 0.5).astype(jnp.float32)
        goal_dist_reward = jnp.sum(self.goal_dist_reward_scale * (goal_dist_before - goal_dist))
        goal_arrive_reward = jnp.sum(2.0 * goal_arrive)

        success_reward = (quat_dist > 0.9) * jnp.prod(goal_arrive) * 100.0

        # up term: 0.1 per upright ant, summed then x10 (ten_ant.py:1191-1246)
        up_reward = jnp.sum(jnp.where(per_ant[:, 12] > 0.93, self.up_weight, 0.0)) * 10.0

        actions_cost = jnp.sum(actions**2)
        electricity_cost = jnp.sum(jnp.abs(actions * per_ant[:, 22:30]))
        dof_at_limit_cost = jnp.sum(per_ant[:, 14:22] > 0.99)

        alive_reward = 5.0
        total = (alive_reward + up_reward + quat_reward + ant_dist_reward
                 + goal_dist_reward + goal_arrive_reward + success_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - self.joints_at_limit_cost_scale * dof_at_limit_cost)

        fallen = jnp.any(per_ant[:, 2] < self.termination_height)
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (progress >= self.max_episode_length - 1)
        return total, done
