"""Round-2 MARL fidelity: PopArt cadence, num_mini_batch, active/bad masks,
linear lr decay, episode-faithful eval, cfg-key policing.

Reference anchors: marl/utils/popart.py:35-61, valuenorm.py:37-55,
separated_buffer.py:124-229, happo_trainer.py:44-63,130-143,200-216,
mappo_trainer.py:53-82, runner.py:123,351-409.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from massive_marl_tpu.algos.marl import nets
from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from tests.test_marl import TeamEnv


class TimedTeamEnv(TeamEnv):
    max_episode_length = TeamEnv.max_len


# ---------------------------------------------------------------------------
# PopArt / ValueNorm cadence vs a straight numpy port of the torch reference
# ---------------------------------------------------------------------------

class _RefNormalizer:
    """Numpy re-statement of the reference running normalizer math, shared by
    PopArt (popart.py:8-76) and ValueNorm (valuenorm.py:7-79): debiased
    running mean / mean-square with beta=0.99999, var clamped at 1e-2."""

    def __init__(self, beta=0.99999, epsilon=1e-5):
        self.mean = 0.0
        self.mean_sq = 0.0
        self.debias = 0.0
        self.beta = beta
        self.epsilon = epsilon

    def update(self, batch):
        b = np.asarray(batch, np.float64)
        w = self.beta
        self.mean = self.mean * w + b.mean() * (1 - w)
        self.mean_sq = self.mean_sq * w + (b**2).mean() * (1 - w)
        self.debias = self.debias * w + (1 - w)

    def stats(self):
        m = self.mean / max(self.debias, self.epsilon)
        msq = self.mean_sq / max(self.debias, self.epsilon)
        return m, max(msq - m * m, 1e-2)

    def normalize(self, x):
        m, var = self.stats()
        return (np.asarray(x) - m) / np.sqrt(var)

    def popart_forward(self, x):
        """PopArt.forward(train=True): update THEN normalize (popart.py:40-61)."""
        self.update(x)
        return self.normalize(x)


def test_valuenorm_matches_reference_math():
    rng = np.random.default_rng(0)
    ref = _RefNormalizer()
    vn = nets.ValueNorm.create()
    for _ in range(5):
        batch = rng.normal(3.0, 2.0, size=64).astype(np.float32)
        ref.update(batch)
        vn = vn.update(jnp.asarray(batch))
        np.testing.assert_allclose(np.asarray(vn.normalize(jnp.asarray(batch))),
                                   ref.normalize(batch), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vn.denormalize(vn.normalize(jnp.asarray(batch)))),
            batch, rtol=1e-4, atol=1e-4)


def test_popart_cadence_two_updates_per_value_loss():
    """norm_targets('popart') must reproduce the reference cal_value_loss:
    error_clipped normalized by the stats after the FIRST forward(train=True),
    error_original by the stats after the SECOND (happo_trainer.py:62-63)."""
    rng = np.random.default_rng(1)
    ref = _RefNormalizer()
    vn = nets.ValueNorm.create()
    for _ in range(4):
        ret = rng.normal(10.0, 5.0, size=32).astype(np.float32)
        vn, rn_clip, rn_orig = nets.norm_targets(vn, jnp.asarray(ret), "popart")
        ref_clip = ref.popart_forward(ret)   # 1st forward -> error_clipped
        ref_orig = ref.popart_forward(ret)   # 2nd forward -> error_original
        np.testing.assert_allclose(np.asarray(rn_clip), ref_clip, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rn_orig), ref_orig, rtol=1e-4, atol=1e-5)
    # valuenorm cadence: single update, shared stats (mappo_trainer.py:74-78)
    vn2 = nets.ValueNorm.create()
    ret = rng.normal(size=16).astype(np.float32)
    vn2, a, b = nets.norm_targets(vn2, jnp.asarray(ret), "valuenorm")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # none: raw pass-through
    vn3, a, b = nets.norm_targets(nets.ValueNorm.create(), jnp.asarray(ret), "none")
    np.testing.assert_array_equal(np.asarray(a), ret)
    assert float(vn3.debias) == 0.0


def test_norm_mode_per_algo_matches_reference_wiring():
    # happo/hatrpo: PopArt or nothing (happo_trainer.py:44-47)
    assert MarlConfig(algorithm_name="happo", use_popart=True,
                      use_valuenorm=True).norm_mode() == "popart"
    assert MarlConfig(algorithm_name="hatrpo", use_popart=False,
                      use_valuenorm=True).norm_mode() == "none"
    # mappo/ippo: popart > valuenorm > none with the both-set assert
    assert MarlConfig(algorithm_name="mappo", use_popart=True,
                      use_valuenorm=False).norm_mode() == "popart"
    assert MarlConfig(algorithm_name="ippo", use_popart=False,
                      use_valuenorm=True).norm_mode() == "valuenorm"
    assert MarlConfig(algorithm_name="mappo", use_popart=False,
                      use_valuenorm=False).norm_mode() == "none"
    with pytest.raises(AssertionError):
        MarlConfig(algorithm_name="mappo", use_popart=True,
                   use_valuenorm=True).norm_mode()


def test_popart_mappo_trains_finite():
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1, use_popart=True,
                     use_valuenorm=False)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    ts, metrics = runner._train_iter(ts)
    ts, metrics = runner._train_iter(ts)
    assert jnp.isfinite(metrics["mean_reward"]).item()
    assert jnp.isfinite(metrics["value_loss"]).item()
    # the popart stats really moved (two updates per epoch per agent)
    assert float(ts.vnorm.debias[0]) > 0.0


# ---------------------------------------------------------------------------
# num_mini_batch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algo", ["mappo", "happo"])
def test_num_mini_batch_changes_the_update(algo):
    """Setting num_mini_batch=2 must actually change the optimization
    (reference feed_forward_generator chunks, separated_buffer.py:183-185) -
    the round-1 build silently ignored it (VERDICT item 2)."""
    def run(nmb):
        cfg = MarlConfig(algorithm_name=algo, episode_length=4, ppo_epoch=2,
                         hidden_size=32, layer_n=1, num_mini_batch=nmb)
        runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
        ts, _ = runner._train_iter(runner.init_state())
        return ts

    ts1, ts2 = run(1), run(2)
    l1 = jax.tree_util.tree_leaves(ts1.actor_params)
    l2 = jax.tree_util.tree_leaves(ts2.actor_params)
    assert all(bool(jnp.isfinite(a).all()) for a in l2)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l1, l2)), \
        "num_mini_batch=2 produced the identical update to full-batch"


def test_minibatch_partition_covers_batch():
    """Chunks are disjoint and cover nmb*(B//nmb) samples like the reference
    randperm split."""
    B, nmb = 37, 4
    mb = B // nmb
    idx = jax.random.permutation(jax.random.PRNGKey(0), B)[: nmb * mb].reshape(nmb, mb)
    flat = np.asarray(idx).reshape(-1)
    assert len(set(flat.tolist())) == nmb * mb
    assert flat.min() >= 0 and flat.max() < B


# ---------------------------------------------------------------------------
# active masks / proper time limits
# ---------------------------------------------------------------------------

def test_active_masks_all_ones_is_noop():
    """With the shared-done ant tasks the reference's insert produces all-ones
    active masks (runner.py:252-255), so enabling the mask-weighted losses
    must not change the update."""
    def run(flags):
        cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                         hidden_size=32, layer_n=1,
                         use_policy_active_masks=flags,
                         use_value_active_masks=flags)
        runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
        ts, _ = runner._train_iter(runner.init_state())
        return ts

    a, b = run(False), run(True)
    for x, y in zip(jax.tree_util.tree_leaves(a.actor_params),
                    jax.tree_util.tree_leaves(b.actor_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6)


def test_proper_time_limits_changes_gae():
    """With truncation events inside the rollout window, use_proper_time_limits
    must alter the advantages (separated_buffer.py:128-143 bad_masks branch)."""
    def run(flag):
        cfg = MarlConfig(algorithm_name="mappo", episode_length=6, ppo_epoch=1,
                         hidden_size=32, layer_n=1, use_proper_time_limits=flag)
        runner = MarlRunner(TimedTeamEnv(), num_envs=8, cfg=cfg, seed=0,
                            print_log=False)
        ts = runner.init_state()
        for _ in range(4):   # cross the 16-step time limit at least once
            ts, _ = runner._train_iter(ts)
        return ts

    a, b = run(False), run(True)
    la = jax.tree_util.tree_leaves(a.critic_params)
    lb = jax.tree_util.tree_leaves(b.critic_params)
    assert all(bool(jnp.isfinite(x).all()) for x in lb)
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_non_gae_returns_branch():
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=1,
                     hidden_size=32, layer_n=1, use_gae=False)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts, metrics = runner._train_iter(runner.init_state())
    assert jnp.isfinite(metrics["value_loss"]).item()


# ---------------------------------------------------------------------------
# linear lr decay
# ---------------------------------------------------------------------------

def test_linear_lr_decay_schedule():
    """lr steps down once per training episode over the full horizon
    (reference update_linear_schedule via runner.py:123)."""
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                     num_mini_batch=1, hidden_size=32, layer_n=1,
                     use_linear_lr_decay=True, num_env_steps=4 * 8 * 10)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    assert runner._episodes_total == 10
    # re-derive the schedule the same way _make_tx builds it
    per_ep = cfg.ppo_epoch * cfg.num_mini_batch
    eps = runner._episodes_total
    sched = lambda step: cfg.lr * (1.0 - min(step // per_ep, eps) / eps)
    assert sched(0) == cfg.lr
    assert sched(per_ep - 1) == cfg.lr                    # constant within an episode
    assert np.isclose(sched(per_ep), cfg.lr * 0.9)        # one episode in
    assert sched(per_ep * eps) == 0.0
    # and the train iteration still runs/learns finitely with the schedule on
    ts, metrics = runner._train_iter(runner.init_state())
    assert jnp.isfinite(metrics["policy_loss"]).item()


# ---------------------------------------------------------------------------
# episode-faithful eval
# ---------------------------------------------------------------------------

def test_eval_is_deterministic_and_phase_independent():
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=1,
                     hidden_size=32, layer_n=1, eval_episodes=6)
    runner = MarlRunner(TimedTeamEnv(), num_envs=8, cfg=cfg, seed=0,
                        print_log=False)
    runner.state = runner.init_state()
    r1 = runner.eval()
    r2 = runner.eval()
    assert r1 == r2, "eval must be deterministic"
    # advancing the TRAINING env state must not change the eval metric
    stepped = jax.vmap(runner.env.step)(
        runner.state.env_state, jnp.zeros((8, TeamEnv.num_agents * TeamEnv.num_actions)))
    runner.state = runner.state.replace(env_state=stepped)
    r3 = runner.eval()
    assert r1 == r3, "eval must not depend on the live training-env phase"
    assert np.isfinite(r1)


# ---------------------------------------------------------------------------
# cfg-key policing
# ---------------------------------------------------------------------------

def test_unknown_cfg_key_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        MarlConfig.from_cfg_train({"episode_length": 8, "totally_bogus_key": 1},
                                  "mappo")
    assert any("totally_bogus_key" in str(x.message) for x in w)


def test_unsupported_cfg_value_raises():
    with pytest.raises(ValueError, match="use_single_network"):
        MarlConfig.from_cfg_train({"use_single_network": True}, "mappo")
    with pytest.raises(ValueError, match="recurrent_N"):
        MarlConfig.from_cfg_train({"recurrent_N": 2}, "mappo")
    # default-valued unsupported keys pass silently
    MarlConfig.from_cfg_train({"use_single_network": False, "recurrent_N": 1},
                              "mappo")


def test_shipped_cfgs_load_clean():
    """Every shipped MARL cfg must parse with zero warnings and honor its
    normalizer flags (the round-1 cfgs advertised use_popart and dropped it)."""
    import os
    import yaml
    from massive_marl_tpu.utils.config import CFG_ROOT
    expect = {"mappo": "popart", "happo": "popart", "hatrpo": "popart",
              "ippo": "valuenorm"}
    for algo, mode in expect.items():
        with open(os.path.join(CFG_ROOT, algo, "config.yaml")) as f:
            cfg_train = yaml.safe_load(f)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mc = MarlConfig.from_cfg_train(cfg_train, algo)
        assert not w, [str(x.message) for x in w]
        assert mc.norm_mode() == mode, (algo, mc.norm_mode())


# ---------------------------------------------------------------------------
# recurrent chunked BPTT (data_chunk_length)
# ---------------------------------------------------------------------------

def test_recurrent_data_chunk_length_honored():
    """data_chunk_length=2 with T=4 must train through 2-step BPTT chunks
    from recorded chunk-start hiddens (recurrent_generator,
    separated_buffer.py:312-425) and produce a DIFFERENT update than
    whole-episode chunks."""
    from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner

    def run(L):
        cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                         hidden_size=32, layer_n=1, use_recurrent_policy=True,
                         data_chunk_length=L)
        runner = RecurrentMarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0,
                                     print_log=False)
        ts = runner.init_state()
        ts, metrics = runner._train_iter(ts)
        assert jnp.isfinite(metrics["value_loss"]).item()
        return ts

    whole, chunk2 = run(None), run(2)
    la = jax.tree_util.tree_leaves(whole.actor_params)
    lb = jax.tree_util.tree_leaves(chunk2.actor_params)
    assert all(bool(jnp.isfinite(x).all()) for x in lb)
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_recurrent_bad_chunk_length_rejected():
    from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, hidden_size=32,
                     layer_n=1, use_recurrent_policy=True, data_chunk_length=3)
    with pytest.raises(ValueError, match="data_chunk_length"):
        RecurrentMarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)


def test_recurrent_minibatch_and_happo_chunked():
    from massive_marl_tpu.algos.marl.recurrent_runner import RecurrentMarlRunner
    cfg = MarlConfig(algorithm_name="happo", episode_length=4, ppo_epoch=1,
                     hidden_size=32, layer_n=1, use_recurrent_policy=True,
                     data_chunk_length=2, num_mini_batch=2)
    runner = RecurrentMarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0,
                                 print_log=False)
    ts, metrics = runner._train_iter(runner.init_state())
    assert jnp.isfinite(metrics["value_loss"]).item()
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(ts.actor_params))


# ---------------------------------------------------------------------------
# phase split (profiling surface) + bf16 Adam moments
# ---------------------------------------------------------------------------

def test_train_iter_phase_split_is_semantics_preserving():
    """rollout_phase/update_phase (exposed for scripts/profile_marl.py's
    overlap probe) compose to exactly train_iter."""
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    it = runner._make_train_iter()
    ts_a, m_a = jax.jit(it)(ts)
    es, k, traj = jax.jit(it.rollout_phase)(ts)
    ts_b, m_b = jax.jit(lambda t: it.update_phase(t, es, k, traj))(ts)
    assert jnp.allclose(m_a["mean_reward"], m_b["mean_reward"])
    for la, lb in zip(jax.tree_util.tree_leaves(ts_a.actor_params),
                      jax.tree_util.tree_leaves(ts_b.actor_params)):
        assert jnp.allclose(la, lb)


def test_bf16_adam_mu_trains_and_halves_moment_storage():
    cfg = MarlConfig(algorithm_name="mappo", episode_length=4, ppo_epoch=2,
                     hidden_size=32, layer_n=1, bf16_adam_mu=True)
    runner = MarlRunner(TeamEnv(), num_envs=8, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    ts, metrics = runner._train_iter(ts)
    assert jnp.isfinite(metrics["mean_reward"]).item()
    dts = {str(x.dtype) for x in jax.tree_util.tree_leaves(ts.actor_opt)
           if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)}
    assert "bfloat16" in dts  # mu in bf16; nu/params stay f32
    for leaf in jax.tree_util.tree_leaves(ts.actor_params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_fused_clip_adam_matches_optax():
    """FusedClipAdam (one-traversal clip+Adam+apply, MarlConfig
    optimizer='fused_adam') must be bit-compatible-ish with the optax chain
    it replaces, including an active global-norm clip and a callable lr
    schedule."""
    import optax
    from massive_marl_tpu.algos.marl.runner import FusedClipAdam

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(16, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(8), jnp.float32)}
    clip, eps = 1.0, 1e-5
    sched = lambda step: 1e-3 * (1.0 + step.astype(jnp.float32) * 0.0 + 1.0) / 2.0

    ref_tx = optax.chain(optax.clip_by_global_norm(clip),
                         optax.adam(sched, eps=eps))
    fused = FusedClipAdam(sched, clip=clip, eps=eps)

    p_ref, o_ref = params, ref_tx.init(params)
    p_f, o_f = params, fused.init(params)
    for i in range(5):
        scale = 10.0 if i % 2 == 0 else 0.01   # alternate clip active/inactive
        g = {"w": jnp.asarray(scale * rng.randn(16, 8), jnp.float32),
             "b": jnp.asarray(scale * rng.randn(8), jnp.float32)}
        u, o_ref = ref_tx.update(g, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_f, o_f = fused.update_apply(g, o_f, p_f)
        for k in params:
            np.testing.assert_allclose(np.asarray(p_f[k]), np.asarray(p_ref[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=f"step {i} {k}")


def test_mappo_fused_adam_optimizer_equivalence():
    """One full MAPPO train iteration with optimizer='fused_adam' matches the
    default optax path (same seed, same batch)."""
    E = 8
    mk = lambda opt: MarlRunner(
        TeamEnv(), num_envs=E,
        cfg=MarlConfig(algorithm_name="mappo", hidden_size=32, layer_n=1,
                       ppo_epoch=2, optimizer=opt),
        seed=0, print_log=False)
    ref, fus = mk("adam"), mk("fused_adam")
    ts_r, m_r = ref._train_iter(ref.init_state())
    ts_f, m_f = fus._train_iter(fus.init_state())
    flat_r = jax.tree_util.tree_leaves(ts_r.actor_params)
    flat_f = jax.tree_util.tree_leaves(ts_f.actor_params)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m_r["value_loss"]), float(m_f["value_loss"]),
                               rtol=1e-4, atol=1e-6)
