"""OneAnt: a single ant pushes a 1x1x1 frictionless box to the origin.

Faithful re-derivation of /root/reference/agents/tasks/one_ant.py:
  * scene: ant spawns at (-6, 0, 1), box (mass 1) at (-4, 0, 1)
    (one_ant.py:233-266), plane friction 1/1/0 (cfg/OneAnt.yaml plane)
  * obs (60): one_ant.py:566-627 layout, including 24 foot-sensor dims
  * reward: compute_ant_reward (one_ant.py:466-563): alive 0.5 + up + quat
    alignment + 500*approach-delta (gated off within 1.5 m of the box) +
    500*box-to-target progress + arrive/success bonuses - action/electricity/
    limit costs; death at z < 0.31 -> -2 (cfg/OneAnt.yaml terminationHeight)
  * auto-reset semantics per base.py
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from massive_marl_tpu.phys import mjcf
from massive_marl_tpu.envs import obs_math
from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, reset_scene, scene_step
from massive_marl_tpu.envs.base import EnvState, select_tree


@struct.dataclass
class OneAntCarry:
    pos_before: jnp.ndarray  # [2] ant xy
    box_before: jnp.ndarray  # [2] box xy


class OneAntEnv:
    num_obs = 60
    num_actions = 8
    num_agents = 1
    num_states = 60  # states_buf == obs for the single-agent task

    def __init__(self, cfg: Dict[str, Any] | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        self.max_episode_length = env_cfg.get("episodeLength", 1000)
        self.dof_vel_scale = env_cfg.get("dofVelocityScale", 0.2)
        self.contact_force_scale = env_cfg.get("contactForceScale", 0.1)
        self.power_scale = env_cfg.get("powerScale", 1.0)
        self.heading_weight = env_cfg.get("headingWeight", 0.5)
        self.up_weight = env_cfg.get("upWeight", 0.1)
        self.actions_cost_scale = env_cfg.get("actionsCost", 0.005)
        self.energy_cost_scale = env_cfg.get("energyCost", 0.05)
        self.joints_at_limit_cost_scale = env_cfg.get("jointsAtLimitCost", 0.1)
        self.death_cost = env_cfg.get("deathCost", -2.0)
        self.termination_height = env_cfg.get("terminationHeight", 0.31)
        # reward scales fixed in the task class (one_ant.py:56-60)
        self.quat_reward_scale = 1.0
        self.ant_dist_reward_scale = 500.0
        self.goal_dist_reward_scale = 500.0

        sim_cfg = cfg.get("sim", {})
        dt = sim_cfg.get("dt", 0.0166)
        substeps = sim_cfg.get("substeps", 3)
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
        # fused Pallas physics (ops/fused_substep.py): "auto" = on for TPU.
        # DR composes with it (randomized params ride as a kernel operand).
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
        self.dr_frequency = int(rp.get("frequency", 1))
        rb = (dr_spec or {}).get("rigid_body_properties", {})
        self._dr_mass_setup_only = bool(rb.get("mass", {}).get("setup_only", False))
        self._obs_noise = _dr.noise_fn(rp.get("observations") if self.randomize else None)
        self._act_noise = _dr.noise_fn(rp.get("actions") if self.randomize else None)

        model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
        self.model = model
        self.spec = AntSceneSpec(
            ant_sys=model.system,
            box_sys=mjcf.make_box_system((0.5, 0.5, 0.5), density=1.0, friction=0.0),
            box_half_extents=(0.5, 0.5, 0.5),
            num_ants=1,
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
        self.box_targets = jnp.zeros(2)

    # -- scene spawning (one_ant.py:233-266) --
    def _fresh_pipeline(self, key, frame=None) -> AntSceneState:
        return reset_scene(self.spec, key,
                           ant_start=jnp.array([[-6.0, 0.0, 1.0]]),
                           box_start=jnp.array([-4.0, 0.0, 1.0]),
                           init_hinge=self.init_hinge, frame=frame)

    def _dr_reset(self, fresh: AntSceneState, stepped: AntSceneState,
                  prev: AntSceneState) -> AntSceneState:
        """Frequency-gated re-randomization with setup_only persistence
        (see TenAntEnv._dr_reset)."""
        if not self.randomize:
            return fresh
        from massive_marl_tpu.envs.base import select_tree as _sel
        resample = stepped.dr_count >= self.dr_frequency
        new_dr = _sel(resample, fresh.dr, prev.dr)
        if self._dr_mass_setup_only:
            new_dr = new_dr.replace(mass=prev.dr.mass)
        return fresh.replace(dr=new_dr,
                             dr_count=jnp.where(resample, 0, stepped.dr_count),
                             # correlated-noise sample persists until the next
                             # re-randomization (base_task.py:281-288)
                             corr_key=_sel(resample, fresh.corr_key,
                                           prev.corr_key))

    def _carry_of(self, pipeline: AntSceneState) -> OneAntCarry:
        return OneAntCarry(pos_before=pipeline.ant_qpos[0, 0:2],
                           box_before=pipeline.box_qpos[0:2])

    def _obs(self, pipeline: AntSceneState, actions) -> jnp.ndarray:
        sys = self.spec.ant_sys
        return obs_math.ant_obs_60(
            pipeline.ant_qpos[0], pipeline.ant_qvel[0], actions,
            pipeline.sensors[0], self.targets,
            sys.jnt_range[:, 0], sys.jnt_range[:, 1],
            self.dof_vel_scale, self.contact_force_scale)

    def reset(self, key) -> EnvState:
        key, sub = jax.random.split(key)
        pipeline = self._fresh_pipeline(sub)
        obs = self._obs(pipeline, jnp.zeros(8))
        return EnvState(pipeline=pipeline, carry=self._carry_of(pipeline),
                        progress=jnp.asarray(0, jnp.int32),
                        done=jnp.asarray(False),
                        key=key, obs=obs, reward=jnp.asarray(0.0))

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        # 1. physics on the pre-reset state (reference order, base_task.py:129-149)
        key, kn_a, kn_o = jax.random.split(state.key, 3)
        applied = self._act_noise(kn_a, actions, state.pipeline.frame,
                                  jax.random.fold_in(state.pipeline.corr_key, 0))
        stepped = scene_step(self.spec, state.pipeline, applied[None, :])
        return self._finish_step(stepped, actions, key, kn_o, state)

    def step_batch(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        """Batched step (leading env axis); fused Pallas physics when enabled."""
        if not self.use_fused:
            return jax.vmap(self.step)(state, actions)
        from massive_marl_tpu.ops.fused_substep import fused_scene_step
        E = actions.shape[0]
        triple = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)
        key, kn_a, kn_o = triple[:, 0], triple[:, 1], triple[:, 2]
        applied = jax.vmap(self._act_noise)(
            kn_a, actions, state.pipeline.frame,
            jax.vmap(lambda k: jax.random.fold_in(k, 0))(state.pipeline.corr_key))
        stepped = fused_scene_step(self.spec, state.pipeline, applied[:, None, :])
        return jax.vmap(self._finish_step)(stepped, actions, key, kn_o, state)

    def _finish_step(self, stepped: AntSceneState, actions: jnp.ndarray,
                     key: jnp.ndarray, kn_o: jnp.ndarray, state: EnvState) -> EnvState:
        # 2. auto-reset envs flagged done last step
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

        # 3. obs / reward / done - reward from the CLEAN obs; DR noise only
        # touches the returned obs (reference order, base_task.py:139-149)
        obs = self._obs(pipeline, actions)
        reward, done = self._reward(obs, actions, pipeline, carry_prev, progress)
        obs = self._obs_noise(kn_o, obs, pipeline.frame,
                              jax.random.fold_in(pipeline.corr_key, 1))
        carry = self._carry_of(pipeline)
        return EnvState(pipeline=pipeline, carry=carry, progress=progress,
                        done=done, key=key, obs=obs, reward=reward)

    def _reward(self, obs, actions, pipeline: AntSceneState, carry: OneAntCarry, progress):
        """compute_ant_reward, one_ant.py:466-563."""
        ant_pos = pipeline.ant_qpos[0, 0:2]
        box_pos = pipeline.box_qpos[0:2]
        box_quat = pipeline.box_qpos[3:7]

        quat_dist = obs_math.box_quat_alignment(box_quat)
        quat_reward = self.quat_reward_scale * quat_dist

        ant_push = 1.0 - (obs_math.l2_xy(ant_pos, box_pos) < 1.5)
        ant_dist = obs_math.l2_xy(carry.pos_before, carry.box_before) - obs_math.l2_xy(ant_pos, box_pos)
        ant_dist_reward = self.ant_dist_reward_scale * ant_dist * ant_push

        goal_dist_before = obs_math.l2_xy(self.box_targets, carry.box_before)
        goal_dist = obs_math.l2_xy(self.box_targets, box_pos)
        goal_arrive = (goal_dist < 0.5).astype(jnp.float32)
        goal_dist_reward = self.goal_dist_reward_scale * (goal_dist_before - goal_dist)
        goal_arrive_reward = 2.0 * goal_arrive

        success_reward = (quat_dist > 0.9) * goal_arrive * 10.0

        up_reward = jnp.where(obs[10] > 0.93, self.up_weight, 0.0)

        actions_cost = jnp.sum(actions**2)
        electricity_cost = jnp.sum(jnp.abs(actions * obs[20:28]))
        dof_at_limit_cost = jnp.sum(obs[12:20] > 0.99)

        alive_reward = 0.5
        total = (alive_reward + up_reward + quat_reward + ant_dist_reward
                 + goal_dist_reward + goal_arrive_reward + success_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - self.joints_at_limit_cost_scale * dof_at_limit_cost)

        fallen = obs[0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (progress >= self.max_episode_length - 1)
        return total, done
