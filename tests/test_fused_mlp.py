"""Fused Dense->ELU->LayerNorm Pallas block vs the flax MLPBase reference.

Runs in interpret mode on CPU (ops/fused_mlp auto-detects the backend).
Tolerances are bf16-appropriate: both paths keep the activation stream in
bf16, but round at different points (the kernel accumulates elu/LN in f32).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.algos.marl import fused_nets, nets


N, B, OBS, ACT = 3, 64, 46, 8


@pytest.fixture(scope="module")
def stacked_actor():
    actor = nets.MarlActor(act_dim=ACT, hidden_size=256)
    key = jax.random.PRNGKey(0)
    params = jax.vmap(lambda k: actor.init(k, jnp.zeros((1, OBS))))(
        jax.random.split(key, N))
    obs = jax.random.normal(jax.random.PRNGKey(1), (N, B, OBS), jnp.float32)
    return actor, params, obs


def test_actor_forward_matches_flax(stacked_actor):
    actor, params, obs = stacked_actor
    mean_ref, std_ref = jax.vmap(actor.apply)(params, obs)
    mean_f, std_f = fused_nets.actor_apply(params, obs)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_ref),
                               rtol=0, atol=3e-2)
    np.testing.assert_allclose(np.asarray(std_f), np.asarray(std_ref),
                               rtol=1e-5, atol=0)


def test_actor_grads_match_flax(stacked_actor):
    actor, params, obs = stacked_actor
    actions = jax.random.normal(jax.random.PRNGKey(2), (N, B, ACT))
    adv = jax.random.normal(jax.random.PRNGKey(3), (N, B))

    def loss_flax(p):
        mean, std = jax.vmap(actor.apply)(p, obs)
        logp = nets.normal_log_prob(mean, std, actions)
        return jnp.sum(jnp.mean(logp * adv, axis=-1))

    def loss_fused(p):
        mean, std = fused_nets.actor_apply(p, obs)
        logp = nets.normal_log_prob(mean, std, actions)
        return jnp.sum(jnp.mean(logp * adv, axis=-1))

    g_ref = jax.grad(loss_flax)(params)
    g_f = jax.grad(loss_fused)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for (path, r), f in zip(flat_ref, flat_f):
        r, f = np.asarray(r, np.float32), np.asarray(f, np.float32)
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(
            f, r, rtol=0, atol=6e-2 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("algo", ["mappo", "happo"])
def test_runner_fused_iteration_matches_flax(algo):
    """One full MARL train iteration, fused vs flax update path, same seed:
    metrics agree to bf16 tolerance and the fused path stays finite."""
    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
    from massive_marl_tpu.envs.ten_ant import TenAntEnv

    env = TenAntEnv({"sim": {"substeps": 2}})
    out = {}
    for fused in (False, True):
        cfg = MarlConfig(algorithm_name=algo, hidden_size=128,
                         use_fused_mlp=fused)
        r = MarlRunner(env, num_envs=4, cfg=cfg, seed=7, print_log=False)
        ts = r.init_state()
        ts, metrics = r._train_iter(ts)
        out[fused] = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(list(out[fused].values())).all(), out[fused]
    # identical rollouts (fused only changes the update), close losses
    assert out[True]["mean_reward"] == pytest.approx(out[False]["mean_reward"], abs=1e-5)
    assert out[True]["value_loss"] == pytest.approx(out[False]["value_loss"],
                                                    rel=0.15, abs=0.05)


def test_fused_mappo_sharded_matches_single_device():
    """MAPPO with the fused update under shard_map on the virtual 8-device
    mesh equals the single-device fused run (pmean'd grads/stats)."""
    from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
    from massive_marl_tpu.envs.ten_ant import TenAntEnv
    from massive_marl_tpu.parallel import mesh as meshlib

    env = TenAntEnv({"sim": {"substeps": 2}})
    cfg = MarlConfig(hidden_size=128, use_fused_mlp=True)
    out = {}
    for mesh in (None, meshlib.make_mesh(8)):
        r = MarlRunner(env, num_envs=16, cfg=cfg, seed=11, print_log=False,
                       mesh=mesh)
        ts = r.init_state()
        if mesh is not None:
            ts = meshlib.apply_sharding(ts, mesh)
        ts, metrics = r._train_iter(ts)
        key = "sharded" if mesh is not None else "single"
        out[key] = (jax.device_get(ts.actor_params), metrics)
    # identical rollout, pmean'd update: same params up to reduction order
    for (p1, s1), p2 in zip(
            jax.tree_util.tree_flatten_with_path(out["single"][0])[0],
            jax.tree_util.tree_leaves(out["sharded"][0])):
        np.testing.assert_allclose(
            np.asarray(s1, np.float32), np.asarray(p2, np.float32),
            rtol=0, atol=2e-2 * max(1.0, float(np.abs(np.asarray(s1)).max())),
            err_msg=f"param mismatch at {jax.tree_util.keystr(p1)}")
    assert out["sharded"][1]["mean_reward"] == pytest.approx(
        float(out["single"][1]["mean_reward"]), abs=1e-4)


def test_critic_matches_flax():
    critic = nets.MarlCritic(hidden_size=256)
    key = jax.random.PRNGKey(4)
    params = jax.vmap(lambda k: critic.init(k, jnp.zeros((1, 388))))(
        jax.random.split(key, N))
    x = jax.random.normal(jax.random.PRNGKey(5), (N, B, 388), jnp.float32)
    v_ref = jax.vmap(critic.apply)(params, x)
    v_f = fused_nets.critic_apply(params, x)
    assert v_f.shape == (N, B)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                               rtol=0, atol=5e-2 * float(jnp.abs(v_ref).max()))
