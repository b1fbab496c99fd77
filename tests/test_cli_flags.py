"""CLI flag-surface parity tests (reference agents/utils/config.py:216-321)."""
import pytest

from massive_marl_tpu.utils import config as cfg_mod


def test_full_reference_flag_surface_accepted():
    args = cfg_mod.get_args([
        "--task", "OneAnt", "--algo", "ppo", "--num_envs", "8",
        "--episode_length", "100", "--seed", "3", "--max_iterations", "2",
        "--test", "--play", "--model_dir", "x", "--logdir", "/tmp/x",
        "--experiment", "e", "--metadata", "--cfg_train", "", "--cfg_env", "",
        "--randomize", "--datatype", "expert", "--task_type", "Python",
        "--rl_device", "tpu", "--headless", "--torch_deterministic",
        "--resume", "7", "--minibatch_size", "64", "--steps_num", "16",
        "--num_proc", "2", "--random_actions", "--bench_len", "3",
        "--bench_file", "/tmp/b",
    ])
    assert args.resume == 7 and args.bench_len == 3 and args.play


def test_experiment_name_alias():
    args = cfg_mod.get_args(["--experiment_name", "foo"])
    assert args.experiment == "foo"


def test_horovod_rejected_like_reference():
    # reference config.py:299-300 rejects --horovod on the rl-pytorch path
    with pytest.raises(SystemExit):
        cfg_mod.get_args(["--horovod"])


def test_checkpoint_rejected_like_reference():
    # reference config.py:305-306
    with pytest.raises(SystemExit):
        cfg_mod.get_args(["--checkpoint", "/tmp/some.ckpt"])


def test_metadata_logdir_suffix():
    args = cfg_mod.get_args(["--task", "OneAnt", "--algo", "ppo",
                             "--experiment", "exp1", "--metadata"])
    logdir, _, _ = cfg_mod.retrieve_cfg(args)
    assert "exp1" in logdir and "Python" in logdir


def test_mat_config_from_cfg_train():
    import os
    import yaml
    from massive_marl_tpu.algos.marl.mat import MatConfig
    with open(os.path.join(cfg_mod.CFG_ROOT, "mat", "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    c = MatConfig.from_cfg_train(cfg)
    assert c.lr == 5e-4 and c.embed == 64 and c.max_grad_norm == 10.0


def test_random_actions_bench_mode(tmp_path):
    """--random_actions runs the env-throughput benchmark and writes JSON
    (the reference's dormant --bench_* flags, config.py:266-272)."""
    import json
    from massive_marl_tpu.cli.train import train
    bf = tmp_path / "bench.jsonl"
    args = cfg_mod.get_args([
        "--task", "OneAnt", "--algo", "ppo", "--num_envs", "4",
        "--seed", "0", "--random_actions", "--bench_len", "2",
        "--bench_file", str(bf), "--logdir", str(tmp_path / "logs")])
    results = train(args)
    assert len(results) == 2
    lines = [json.loads(l) for l in bf.read_text().splitlines()]
    assert lines[0]["num_envs"] == 4 and lines[0]["env_steps_per_s"] > 0
