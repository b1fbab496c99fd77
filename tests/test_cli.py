"""End-to-end CLI + library-API smoke tests.

Covers the reference's user-facing surfaces: `python train.py --task --algo
--num_envs ...` (train.py:20-96) and `agents.make()` + random-action loop
(train_customize.py:1-13), on tiny shapes so the whole path (arg parsing,
yaml loading, env build, trainer construction, train loop, logging,
checkpoint save) runs on CPU in seconds.
"""
import glob
import os

import jax.numpy as jnp

from massive_marl_tpu.utils import config as cfg_mod
from massive_marl_tpu.cli.train import train


def _args(argv):
    return cfg_mod.get_args(argv)


def test_cli_ppo_one_ant(tmp_path):
    logdir = str(tmp_path / "ppo")
    trainer = train(_args([
        "--task", "OneAnt", "--algo", "ppo", "--num_envs", "8",
        "--max_iterations", "2", "--seed", "3", "--logdir", logdir]))
    assert int(trainer.state.iteration) == 2
    # metrics landed (native tfevents + csv) under <logdir>/seed<N>/
    assert glob.glob(os.path.join(logdir, "**", "events.out.tfevents.*"), recursive=True)
    assert glob.glob(os.path.join(logdir, "**", "metrics.csv"), recursive=True)


def test_cli_mappo_ten_ant(tmp_path):
    logdir = str(tmp_path / "mappo")
    runner = train(_args([
        "--task", "TenAnt", "--algo", "mappo", "--num_envs", "4",
        "--num_env_steps", "64", "--seed", "1", "--logdir", logdir]))
    assert int(runner.state.iteration) == 2  # 64 steps / (T=8 * E=4)
    assert jnp.isfinite(runner.state.env_state.obs).all()


def test_cli_test_mode_evaluates(tmp_path, monkeypatch):
    logdir = str(tmp_path / "eval")
    monkeypatch.setenv("VIEWER_STEPS", "4")  # keep the CPU compile tiny
    trainer = train(_args([
        "--task", "OneAnt", "--algo", "ppo", "--num_envs", "4",
        "--test", "--logdir", logdir]))
    # --test returns without training
    assert int(trainer.state.iteration) == 0
    # the interactive viewer (reference base_task.py:90-109 counterpart) is
    # written on --test without --headless
    import glob as g
    html = g.glob(os.path.join(logdir, "**", "viewer_*.html"), recursive=True)
    assert html, "viewer_<task>.html not written on --test"
    body = open(html[0]).read()
    assert "canvas" in body and "DATA" in body


def test_rlgames_shim(monkeypatch, tmp_path):
    """train_rlgames.py parses its flag surface (incl. --horovod) and trains."""
    import train_rlgames
    monkeypatch.setattr("sys.argv", [
        "train_rlgames.py", "--task", "OneAnt", "--num_envs", "8",
        "--max_iterations", "2", "--seed", "0", "--horovod"])
    train_rlgames.main()


def test_make_api_random_loop():
    """train_customize.py semantics: make() -> reset -> step(random)."""
    import numpy as np
    import massive_marl_tpu

    env = massive_marl_tpu.make("OneAnt", num_envs=4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 60)
    for _ in range(3):
        actions = np.random.uniform(-1, 1, (4, env.num_actions)).astype(np.float32)
        obs, rew, done, info = env.step(jnp.asarray(actions))
    assert obs.shape == (4, 60) and rew.shape[0] == 4
    assert bool(jnp.isfinite(obs).all())
