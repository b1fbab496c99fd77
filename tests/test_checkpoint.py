"""Async checkpointer round-trip + rotation + learning-curve regression."""
import numpy as np
import jax.numpy as jnp
import pytest

from massive_marl_tpu.utils.checkpoint import AsyncCheckpointer, restore_latest


def test_async_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    ck = AsyncCheckpointer(d, keep=2)
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    for s in (1, 2, 3):
        ck.save(s, {**tree, "step": jnp.asarray(s)})
    ck.wait()
    restored, step = restore_latest(d, tree)
    assert step == 3
    assert int(restored["step"]) == 3
    np.testing.assert_array_equal(np.array(restored["w"]), np.arange(6).reshape(2, 3))
    # rotation kept only the last 2
    import glob, os
    assert len(glob.glob(os.path.join(d, "ckpt_*.ckpt"))) == 2
    ck.close()


def test_restore_latest_empty(tmp_path):
    restored, step = restore_latest(str(tmp_path), {"x": jnp.zeros(2)})
    assert restored is None and step is None


@pytest.mark.slow
def test_one_ant_ppo_learning_regression():
    """Golden-seed learning smoke on CPU (SURVEY.md section 4 item 3): tiny
    OneAnt+PPO must improve within 40 iterations."""
    from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
    from massive_marl_tpu.envs.one_ant import OneAntEnv
    env = OneAntEnv({"sim": {"substeps": 4}})
    cfg = PPOConfig(nsteps=8, nminibatches=2, noptepochs=3, hidden=(64, 64),
                    lr=1e-3)
    ppo = PPO(env, num_envs=32, cfg=cfg, seed=0, print_log=False)
    ppo.state = ppo.init_state()
    rews = []
    for _ in range(40):
        ppo.state, m = ppo._train_iter(ppo.state)
        rews.append(float(m["mean_reward"]))
    assert np.isfinite(rews).all()
    assert np.mean(rews[-10:]) > np.mean(rews[:10]), (np.mean(rews[:10]), np.mean(rews[-10:]))
