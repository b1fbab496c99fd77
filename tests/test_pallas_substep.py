"""Fused Pallas scene step (ops/fused_substep.py) must agree with the array
engine's vmapped scene step, and the fused TenAnt step_batch with
vmap(TenAnt.step).  Runs in pallas interpret mode on CPU.

The two agreement tests are opt-in via RUN_SCALAR_PHYS_TESTS=1 (like
tests/test_fused_substep.py): XLA:CPU cold-compiles the fully-unrolled
scalar graph extremely slowly; the compiled TPU path is validated on real
hardware by scripts/validate_fused_tpu.py instead."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

heavy = pytest.mark.skipif(
    not os.environ.get("RUN_SCALAR_PHYS_TESTS"),
    reason="interpret-mode agreement tests are opt-in (XLA:CPU cold-compile cost)")

from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.envs.ant_scene import reset_scene, scene_step
from massive_marl_tpu.ops import fused_substep as fs


E = 4


@pytest.fixture(scope="module")
def env():
    return TenAntEnv({"sim": {"substeps": 2}})


@pytest.fixture(scope="module")
def batch_state(env):
    keys = jax.random.split(jax.random.PRNGKey(3), E)
    return jax.vmap(env._fresh_pipeline)(keys)


def test_pack_roundtrip():
    x = jnp.arange(40 * 15, dtype=jnp.float32).reshape(40, 15)
    x3 = fs.pack_fields(x, fs._rows(40, 8))
    assert x3.shape == (15, 8, 128)
    np.testing.assert_array_equal(np.asarray(fs.unpack_fields(x3, 40)), np.asarray(x))


@heavy
def test_fused_scene_step_matches_vmapped_engine(env, batch_state):
    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(key, (E, 10, 8), minval=-1.0, maxval=1.0)

    ref = jax.jit(jax.vmap(lambda s, a: scene_step(env.spec, s, a)))(batch_state, actions)
    got = jax.jit(lambda s, a: fs.fused_scene_step(env.spec, s, a, interpret=True))(
        batch_state, actions)

    np.testing.assert_allclose(np.asarray(got.ant_qpos), np.asarray(ref.ant_qpos),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.ant_qvel), np.asarray(ref.ant_qvel),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.box_qpos), np.asarray(ref.box_qpos),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.box_qvel), np.asarray(ref.box_qvel),
                               rtol=5e-3, atol=5e-3)


@heavy
def test_fused_step_batch_matches_vmap_step():
    env_ref = TenAntEnv({"sim": {"substeps": 2}})
    env_fused = TenAntEnv({"sim": {"substeps": 2, "fused_kernel": True}})

    keys = jax.random.split(jax.random.PRNGKey(11), E)
    s_ref = jax.jit(jax.vmap(env_ref.reset))(keys)
    s_fused = jax.jit(jax.vmap(env_fused.reset))(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(5), (E, 80), minval=-1, maxval=1)

    out_ref = jax.jit(jax.vmap(env_ref.step))(s_ref, actions)
    out_fused = jax.jit(env_fused.step_batch)(s_fused, actions)

    np.testing.assert_allclose(np.asarray(out_fused.obs), np.asarray(out_ref.obs),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_fused.reward), np.asarray(out_ref.reward),
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(out_fused.done), np.asarray(out_ref.done))


def test_step_batch_default_path_is_vmap():
    env = TenAntEnv({"sim": {"substeps": 2}})
    keys = jax.random.split(jax.random.PRNGKey(1), E)
    s = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.zeros((E, 80))
    a = jax.jit(env.step_batch)(s, actions)
    b = jax.jit(jax.vmap(env.step))(s, actions)
    np.testing.assert_array_equal(np.asarray(a.obs), np.asarray(b.obs))


@heavy
def test_fused_scene_step_matches_engine_with_dr():
    """DR operand path: fused kernel with per-ant randomized params must
    agree with the array engine consuming the same DrSample (round-1
    disabled the kernel under DR; VERDICT r1 item 3)."""
    import yaml
    from massive_marl_tpu.utils.config import CFG_ROOT
    with open(os.path.join(CFG_ROOT, "TenAnt.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["task"]["randomize"] = True
    cfg["sim"] = {"substeps": 2}
    env = TenAntEnv(cfg)
    keys = jax.random.split(jax.random.PRNGKey(7), E)
    st = jax.vmap(env._fresh_pipeline)(keys)
    # randomized params really vary across ants/envs
    assert st.dr.mass.shape[:2] == (E, 10)
    assert float(jnp.std(st.dr.mass)) > 0

    actions = jax.random.uniform(jax.random.PRNGKey(8), (E, 10, 8),
                                 minval=-1.0, maxval=1.0)
    ref = jax.jit(jax.vmap(lambda s, a: scene_step(env.spec, s, a)))(st, actions)
    got = jax.jit(lambda s, a: fs.fused_scene_step(env.spec, s, a, interpret=True))(
        st, actions)
    np.testing.assert_allclose(np.asarray(got.ant_qpos), np.asarray(ref.ant_qpos),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.ant_qvel), np.asarray(ref.ant_qvel),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.sensors), np.asarray(ref.sensors),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(got.dr_count), np.asarray(ref.dr_count))
