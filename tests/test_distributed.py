"""Distributed tests without a cluster (SURVEY.md section 4 item 4).

Runs on the virtual 8-device CPU mesh set up in conftest.py and asserts:
  1. sharding specs: env state lands on the 'data' axis, params replicate;
  2. psum-equivalence: the 8-way sharded training step produces the same
     parameters/metrics as the unsharded single-device run under a fixed
     seed, up to f32 reduction-order tolerance.

The reference has no multi-device story at all (its --horovod flag is
rejected for the rl-pytorch path, utils/config.py:228-229,299-300); this is
the TPU framework's substitute for that missing coverage.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.one_ant import OneAntEnv
from massive_marl_tpu.parallel import mesh as meshlib


N_DEV = 8


@pytest.fixture(scope="module")
def ppo():
    env = OneAntEnv({"sim": {"substeps": 2}})
    cfg = PPOConfig(nsteps=4, nminibatches=2, noptepochs=2, hidden=(32, 32))
    return PPO(env, num_envs=2 * N_DEV, cfg=cfg, seed=0, print_log=False)


def _leaves_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return flat


def test_mesh_shape_and_axes():
    mesh = meshlib.make_mesh(N_DEV)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (N_DEV, 1)
    mesh2 = meshlib.make_mesh(N_DEV, model_parallel=2)
    assert mesh2.devices.shape == (N_DEV // 2, 2)


def test_train_state_sharding_specs(ppo):
    mesh = meshlib.make_mesh(N_DEV)
    ts = ppo.init_state()
    sh = meshlib.train_state_shardings(ts, mesh)
    # every env-state leaf is sharded on dim 0 over 'data'
    for path, s in _leaves_with_paths(sh.env_state):
        assert isinstance(s, NamedSharding)
        assert s.spec == P("data"), (path, s.spec)
    # params and optimizer state replicate
    for path, s in _leaves_with_paths(sh.params):
        assert s.spec == P(), (path, s.spec)
    for path, s in _leaves_with_paths(sh.opt_state):
        assert s.spec == P(), (path, s.spec)


def test_sharded_step_places_data_on_all_devices(ppo):
    mesh = meshlib.make_mesh(N_DEV)
    ts = meshlib.apply_sharding(ppo.init_state(), mesh)
    qpos = jax.tree_util.tree_leaves(ts.env_state)[0]
    assert len(qpos.sharding.device_set) == N_DEV


def test_psum_equivalence_sharded_vs_single_device(ppo):
    """One full PPO train iteration: 8-way 'data'-sharded run must agree with
    the plain single-device run (identical math; XLA inserts psum/all-gather
    for the sharded version, so only f32 reduction order may differ)."""
    train_iter = ppo._make_train_iter()

    ts0 = ppo.init_state()
    ts_ref, metrics_ref = jax.jit(train_iter)(ts0)

    mesh = meshlib.make_mesh(N_DEV)
    ts_sh = meshlib.apply_sharding(ppo.init_state(), mesh)
    shardings = meshlib.train_state_shardings(ts_sh, mesh)
    with mesh:
        step = jax.jit(train_iter, in_shardings=(shardings,),
                       out_shardings=(shardings, None))
        ts_out, metrics_sh = step(ts_sh)
        jax.block_until_ready(ts_out)

    # parameters after the update.  Tolerance: the math is identical but the
    # 8-way psum reassociates f32 sums, and Adam's 1/sqrt(v) normalization
    # amplifies that noise on near-zero gradients - observed up to ~3e-5
    # absolute on bias terms after 4 update steps.
    for (pa, a), (pb, b) in zip(_leaves_with_paths(ts_ref.params),
                                _leaves_with_paths(ts_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4,
                                   err_msg=str(pa))
    # scalar metrics
    for k in metrics_ref:
        a, b = float(metrics_ref[k]), float(metrics_sh[k])
        assert np.isfinite(a) and np.isfinite(b), k
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5, err_msg=k)
    # output kept its sharding: env state still on all 8 devices
    qpos = jax.tree_util.tree_leaves(ts_out.env_state)[0]
    assert len(qpos.sharding.device_set) == N_DEV


# ---------------------------------------------------------------------------
# MARL trainers on the mesh (VERDICT r1 item 5: HAPPO/HATRPO multi-chip)
# ---------------------------------------------------------------------------

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from tests.test_marl import TeamEnv


@pytest.mark.parametrize("algo", ["mappo", "happo", "hatrpo"])
def test_marl_psum_equivalence_sharded_vs_single_device(algo):
    """One full MARL train iteration per trainer branch: the 8-way
    'data'-sharded run (env rollout under shard_map; HAPPO/HATRPO update
    auto-partitioned by GSPMD, MAPPO fused path pmean'd under shard_map)
    must agree with the single-device run under a fixed seed."""
    env = TeamEnv()
    E = 2 * N_DEV
    cfg = MarlConfig(algorithm_name=algo, episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1)

    ref = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts_ref, metrics_ref = ref._train_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sharded = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False,
                         mesh=mesh)
    with mesh:
        ts0 = meshlib.apply_sharding(sharded.init_state(), mesh)
        ts_sh, metrics_sh = sharded._train_iter(ts0)
        jax.block_until_ready(ts_sh.actor_params)

    for (pa, a), (pb, b) in zip(_leaves_with_paths(ts_ref.actor_params),
                                _leaves_with_paths(ts_sh.actor_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"{algo} {pa}")
    for (pa, a), (pb, b) in zip(_leaves_with_paths(ts_ref.critic_params),
                                _leaves_with_paths(ts_sh.critic_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"{algo} {pa}")
    for k in ("mean_reward", "value_loss", "policy_loss"):
        a, b = float(metrics_ref[k]), float(metrics_sh[k])
        assert np.isfinite(a) and np.isfinite(b), (algo, k)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=f"{algo} {k}")
    # env state stayed sharded across all devices
    leaf = jax.tree_util.tree_leaves(ts_sh.env_state)[0]
    assert len(leaf.sharding.device_set) == N_DEV


# ---------------------------------------------------------------------------
# off-policy / MADDPG / MAT / recurrent trainers on the mesh
# (VERDICT r2 item 2: mesh support for the remaining trainer families)
# ---------------------------------------------------------------------------

from tests.test_ppo import ToyEnv


def _assert_tree_close(a_tree, b_tree, tag, rtol=2e-4, atol=2e-4):
    for (pa, a), (pb, b) in zip(_leaves_with_paths(a_tree),
                                _leaves_with_paths(b_tree)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=rtol, atol=atol, err_msg=f"{tag} {pa}")


@pytest.mark.parametrize("algo", ["sac", "td3"])
def test_offpolicy_psum_equivalence(algo):
    """One off-policy train iteration (env scan + ring writes + grad updates)
    8-way sharded (env batch dim 0, replay ring dim 1 over 'data') vs the
    single-device run under the same seed."""
    from massive_marl_tpu.algos.rl.offpolicy import OffPolicy, OffPolicyConfig
    E = 2 * N_DEV
    cfg = OffPolicyConfig(algo=algo, nsteps=4, noptepochs=1, nminibatches=2,
                          replay_size=16, batch_size=4, hidden_nodes=32,
                          hidden_layer=2)
    ref = OffPolicy(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts_ref, m_ref = ref._train_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sh = OffPolicy(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False,
                   mesh=mesh)
    with mesh:
        ts_sh, m_sh = sh._train_iter(sh.init_state())
        jax.block_until_ready(ts_sh.params)

    _assert_tree_close(ts_ref.params, ts_sh.params, algo)
    _assert_tree_close(ts_ref.target_params, ts_sh.target_params, algo)
    for k in m_ref:
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=f"{algo} {k}")
    # replay ring stayed sharded on its env axis across all devices
    leaf = ts_sh.replay.obs
    assert len(leaf.sharding.device_set) == N_DEV


def test_maddpg_psum_equivalence():
    from massive_marl_tpu.algos.marl.maddpg import MaddpgConfig, MaddpgRunner
    from tests.test_marl import TeamEnv
    E = 2 * N_DEV
    cfg = MaddpgConfig(nsteps=4, replay_size=16, batch_size=4, hidden=32,
                       layers=2)
    ref = MaddpgRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts0 = ref.init_state()
    ts0, _ = ref._collect_iter(ts0)
    ts_ref, m_ref = ref._train_iter(ts0)

    mesh = meshlib.make_mesh(N_DEV)
    sh = MaddpgRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False,
                      mesh=mesh)
    with mesh:
        ts1 = sh.init_state()
        ts1, _ = sh._collect_iter(ts1)
        ts_sh, m_sh = sh._train_iter(ts1)
        jax.block_until_ready(ts_sh.actor_params)

    _assert_tree_close(ts_ref.actor_params, ts_sh.actor_params, "maddpg-actor")
    _assert_tree_close(ts_ref.critic_params, ts_sh.critic_params, "maddpg-critic")
    for k in ("mean_reward", "critic_loss"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    assert len(ts_sh.replay.obs.sharding.device_set) == N_DEV


def test_mat_psum_equivalence():
    from massive_marl_tpu.algos.marl.mat import MatConfig, MatRunner
    from tests.test_marl import TeamEnv
    E = 2 * N_DEV
    cfg = MatConfig(episode_length=4, ppo_epoch=2, embed=16, blocks=1)
    ref = MatRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts_ref, m_ref = ref._train_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sh = MatRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False,
                   mesh=mesh)
    with mesh:
        ts_sh, m_sh = sh._train_iter(sh.init_state())
        jax.block_until_ready(ts_sh.params)

    _assert_tree_close(ts_ref.params, ts_sh.params, "mat")
    for k in ("mean_reward", "value_loss"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    leaf = jax.tree_util.tree_leaves(ts_sh.env_state)[0]
    assert len(leaf.sharding.device_set) == N_DEV


def test_recurrent_marl_psum_equivalence():
    from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner
    from tests.test_marl import TeamEnv
    E = 2 * N_DEV
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1, use_recurrent_policy=True,
                     data_chunk_length=2)
    ref = RecurrentMarlRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0,
                              print_log=False)
    ts_ref, m_ref = ref._train_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sh = RecurrentMarlRunner(TeamEnv(), num_envs=E, cfg=cfg, seed=0,
                             print_log=False, mesh=mesh)
    with mesh:
        ts0 = meshlib.apply_sharding(sh.init_state(), mesh)
        ts_sh, m_sh = sh._train_iter(ts0)
        jax.block_until_ready(ts_sh.actor_params)

    _assert_tree_close(ts_ref.actor_params, ts_sh.actor_params, "rmappo-actor")
    _assert_tree_close(ts_ref.critic_params, ts_sh.critic_params, "rmappo-critic")
    for k in ("mean_reward", "value_loss"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)


# ---------------------------------------------------------------------------
# Long-tail trainers on the mesh (VERDICT r3 item 4: TRPO, MTRL, MAML,
# offline) - every trainer family now takes mesh= and must reproduce the
# single-device math under 8-way 'data' sharding.
# ---------------------------------------------------------------------------


def test_trpo_psum_equivalence():
    from massive_marl_tpu.algos.rl.trpo import TRPO, TRPOConfig
    E = 2 * N_DEV
    cfg = TRPOConfig(nsteps=4, cg_nsteps=4, vf_epochs=2, hidden=(32, 32))
    ref = TRPO(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts_ref, m_ref = ref._train_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sh = TRPO(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False, mesh=mesh)
    with mesh:
        ts_sh, m_sh = sh._train_iter(sh.init_state())
        jax.block_until_ready(ts_sh.actor_params)

    # CG + line search amplify reduction-order noise through 1/sqrt and the
    # accept/reject branch; tolerances looser than the plain-Adam trainers
    _assert_tree_close(ts_ref.actor_params, ts_sh.actor_params, "trpo-actor",
                       rtol=5e-3, atol=5e-4)
    _assert_tree_close(ts_ref.critic_params, ts_sh.critic_params, "trpo-critic",
                       rtol=5e-3, atol=5e-4)
    for k in ("mean_reward", "value_loss"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    qpos = jax.tree_util.tree_leaves(ts_sh.env_state)[0]
    assert len(qpos.sharding.device_set) == N_DEV


def _run_mt(cls, cfg, mesh):
    envs = {"a": ToyEnv(), "b": ToyEnv()}
    t = cls(envs, num_envs=2 * N_DEV, cfg=cfg, seed=0, print_log=False,
            mesh=mesh)
    if mesh is not None:
        with mesh:
            t.run(1)
            jax.block_until_ready(t.state.params)
    else:
        t.run(1)
    return t.state


def test_mtppo_psum_equivalence():
    from massive_marl_tpu.algos.mtrl.mtppo import MTPPO, MTPPOConfig
    cfg = MTPPOConfig(nsteps=4, noptepochs=2, nminibatches=1, hidden=(32, 32))
    ts_ref = _run_mt(MTPPO, cfg, None)
    ts_sh = _run_mt(MTPPO, cfg, meshlib.make_mesh(N_DEV))
    _assert_tree_close(ts_ref.params, ts_sh.params, "mtppo")


def test_mttrpo_psum_equivalence():
    from massive_marl_tpu.algos.mtrl.mttrpo import MTTRPO, MTTRPOConfig
    cfg = MTTRPOConfig(nsteps=4, cg_nsteps=4, vf_epochs=2, hidden=(32, 32))
    ts_ref = _run_mt(MTTRPO, cfg, None)
    ts_sh = _run_mt(MTTRPO, cfg, meshlib.make_mesh(N_DEV))
    _assert_tree_close(ts_ref.params, ts_sh.params, "mttrpo",
                       rtol=5e-3, atol=5e-4)


def test_mtsac_psum_equivalence():
    from massive_marl_tpu.algos.mtrl.mtsac import MTSAC, MTSACConfig
    cfg = MTSACConfig(algo="sac", nsteps=4, replay_size=16, batch_size=8,
                      noptepochs=1, nminibatches=1, hidden_nodes=32,
                      hidden_layer=2)
    ts_ref = _run_mt(MTSAC, cfg, None)
    ts_sh = _run_mt(MTSAC, cfg, meshlib.make_mesh(N_DEV))
    _assert_tree_close(ts_ref.params, ts_sh.params, "mtsac")
    # the shared replay ring stays sharded on its env axis
    assert len(ts_sh.replay["obs"].sharding.device_set) == N_DEV


def test_maml_psum_equivalence():
    from massive_marl_tpu.algos.metarl.maml import MAMLConfig, MAMLPPO
    cfg = MAMLConfig(support_steps=4, query_steps=4, meta_batch_size=2,
                     adapt_steps=1, hidden=(32, 32))
    E = 2 * N_DEV
    ref = MAMLPPO(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts_ref, m_ref = ref._meta_iter(ref.init_state())

    mesh = meshlib.make_mesh(N_DEV)
    sh = MAMLPPO(ToyEnv(), num_envs=E, cfg=cfg, seed=0, print_log=False,
                 mesh=mesh)
    with mesh:
        ts_sh, m_sh = sh._meta_iter(sh.init_state())
        jax.block_until_ready(ts_sh.params)

    # second-order meta-grads amplify f32 reassociation noise
    _assert_tree_close(ts_ref.params, ts_sh.params, "maml", rtol=5e-3, atol=5e-4)
    for k in ("meta_loss", "mean_reward"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


@pytest.mark.parametrize("algo", ["td3_bc", "iql", "bcq"])
def test_offline_psum_equivalence(algo):
    """Two offline grad steps on a synthetic dataset: replicated data +
    'data'-sharded minibatch must reproduce the single-device params."""
    from massive_marl_tpu.algos.offrl.trainers import OfflineConfig, OfflineTrainer
    rng = np.random.RandomState(0)
    N, O, A = 256, 6, 2
    data = dict(states=rng.randn(N, O).astype(np.float32),
                actions=np.tanh(rng.randn(N, A)).astype(np.float32),
                rewards=rng.randn(N, 1).astype(np.float32),
                dones=(rng.rand(N, 1) < 0.05).astype(np.float32),
                next_states=rng.randn(N, O).astype(np.float32))
    cfg = OfflineConfig(algo=algo, batch_size=32, hidden=32, layers=2)

    ref = OfflineTrainer("toy", "expert", cfg, seed=0, print_log=False,
                         data=dict(data))
    ts_ref = ref.init_state()
    for _ in range(2):
        ts_ref, m_ref = ref._train_step(ts_ref)

    mesh = meshlib.make_mesh(N_DEV)
    sh = OfflineTrainer("toy", "expert", cfg, seed=0, print_log=False,
                        data=dict(data), mesh=mesh)
    with mesh:
        ts_sh = sh.init_state()
        for _ in range(2):
            ts_sh, m_sh = sh._train_step(ts_sh)
        jax.block_until_ready(ts_sh.params)

    _assert_tree_close(ts_ref.params, ts_sh.params, algo)
    np.testing.assert_allclose(float(m_ref["q_loss"]), float(m_sh["q_loss"]),
                               rtol=1e-3, atol=1e-4)
