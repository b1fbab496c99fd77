"""Multi-PROCESS distributed execution (SURVEY.md section 2.4/5, VERDICT r4
item 1): the cross-process layer must actually RUN, not just exist.

Spawns 2 real OS processes (scripts/run_multiprocess.py) that each call
parallel/mesh.init_distributed (jax.distributed coordinator handshake over
localhost), build one global mesh spanning both processes, and run
TenAnt+PPO and TenAnt+MAPPO train iterations with the env batch sharded
across processes - collectives ride the Gloo CPU backend, standing in for
ICI/DCN.  Each worker asserts its cross-process parameters equal the
same-seed single-process run (the tests/test_distributed.py oracle); the
launcher writes process 0's report which is re-asserted here.

This runs in the DEFAULT suite.  Set MMT_SKIP_MULTIPROC=1 to skip on
machines where spawning localhost process groups is unavailable.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multiprocess.py")


@pytest.mark.skipif(os.environ.get("MMT_SKIP_MULTIPROC") == "1",
                    reason="multi-process spawn disabled by MMT_SKIP_MULTIPROC")
def test_two_process_execution_matches_single_process(tmp_path):
    out = tmp_path / "mp.json"
    env = dict(os.environ)
    # the launcher sets JAX_PLATFORMS/XLA_FLAGS for its children; scrub the
    # test session's own force-host-device-count so it can't leak through
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, SCRIPT, "--nproc", "2", "--local_devices", "1",
         "--iters", "2", "--out", str(out)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=840)
    assert r.returncode == 0, f"launcher failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    report = json.loads(out.read_text())
    assert report["ok"] is True
    assert report["n_processes"] == 2
    # the mesh really spanned processes: global devices > local devices
    assert report["n_global_devices"] == 2
    assert report["n_local_devices"] == 1
    # cross-process == single-process (worker already asserted; re-assert the
    # recorded numbers here so the evidence lives in the test log)
    assert report["ppo_param_max_abs_diff"] < 2e-4
    assert report["mappo_actor_max_abs_diff"] < 2e-4
    assert report["mappo_critic_max_abs_diff"] < 2e-4
    # each process held only its shard of the global env batch
    assert report["ppo_local_env_rows"] == 2  # num_envs=4 split over 2 procs


@pytest.mark.skipif(os.environ.get("MMT_MULTIPROC_CLI") != "1",
                    reason="opt-in (MMT_MULTIPROC_CLI=1): the CLI launch is "
                           "covered by scripts/run_multiprocess.sh")
def test_cli_multiprocess_launch(tmp_path):
    """One-command multi-host CLI launch (cli/train.py setup_distributed):
    2 processes, same command, MMT_* env vars - both must agree on metrics."""
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_multiprocess.sh"), "2",
         "--task", "TenAnt", "--algo", "mappo", "--num_envs", "8",
         "--max_iterations", "2", "--headless",
         "--logdir", str(tmp_path / "logs")],
        cwd=REPO, capture_output=True, text=True, timeout=840)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("[mappo]")]
    assert len(lines) == 2, lines
    assert lines[0] == lines[1], f"ranks diverged: {lines}"
