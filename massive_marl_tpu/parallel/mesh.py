"""Device mesh + sharding helpers: the framework's distributed-communication
layer (SURVEY.md section 2.4 / 5 "Distributed communication backend").

The reference is single-GPU (its `--horovod` flag is rejected for the
rl-pytorch path, utils/config.py:228-229,299-300).  Here scale-out is a
first-class design: env batches shard over the `data` mesh axis, model
parameters replicate (optionally sharding over `model` for very wide nets),
and XLA's SPMD partitioner inserts the psum/all-gather collectives over ICI.

Multi-host: call `init_distributed()` once per process before creating the
mesh; `jax.devices()` then spans all hosts and the same code runs unchanged.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up (no-op on a single host).

    Arguments fall back to the `MMT_COORDINATOR` / `MMT_NUM_PROCESSES` /
    `MMT_PROCESS_ID` environment variables so a real multi-host launch is
    "same command on every host, plus three env vars" (cli/train.py calls
    this unconditionally before building the env).  Returns True when a
    multi-process runtime was actually initialized.

    Exercised for real (2-4 CPU processes over localhost, cross-process Gloo
    collectives) by scripts/run_multiprocess.py / tests/test_multiprocess.py.
    """
    import os

    if coordinator is None:
        coordinator = os.environ.get("MMT_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("MMT_NUM_PROCESSES", 0)) or None
    if process_id is None:
        pid = os.environ.get("MMT_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    return False


def host_to_global(tree: Any, shardings: Any) -> Any:
    """Place a host-side (or fully-addressable) pytree onto a possibly
    multi-process mesh.

    `jax.device_put` cannot target shardings whose devices span other
    processes; `make_array_from_callback` can - each process materializes
    only the shards it owns, reading them out of its local copy of the full
    value (every process computes the same deterministic host-side init, so
    local slicing yields a consistent global array)."""
    def place(x, s):
        x = np.asarray(x)
        if x.ndim == 0:  # scalars: wrap so indexing callbacks still work
            x = x[None][0]
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(place, tree, shardings)


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh.  model_parallel=1 keeps the model axis trivial
    but present, so sharding annotations stay mesh-ready (SURVEY.md 2.4)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard leading (env/batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_leading_axis(tree: Any, mesh: Mesh) -> Any:
    """Shardings pytree: every array leaf sharded on dim 0 over 'data'."""
    ds = data_sharded(mesh)
    return jax.tree_util.tree_map(lambda _: ds, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rs = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rs, tree)


def shard_axis_tree(tree: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Shardings pytree: array leaves with ndim > axis sharded over 'data'
    on dimension `axis`, everything else (scalars, short leaves) replicated.
    axis=1 is the off-policy replay-ring layout [R, E, ...] - the env axis
    shards, time slots stay local (VERDICT r2 item 2: shard the HBM ring)."""
    def f(x):
        if hasattr(x, "ndim") and x.ndim > axis:
            return NamedSharding(mesh, P(*([None] * axis + ["data"])))
        return replicated(mesh)

    return jax.tree_util.tree_map(f, tree)


def train_state_shardings(ts, mesh: Mesh):
    """Shardings for an algo TrainState: env_state sharded over 'data',
    everything else (params, opt state, scalars) replicated."""
    sh = replicate_tree(ts, mesh)
    return sh.replace(env_state=shard_leading_axis(ts.env_state, mesh))


def apply_sharding(ts, mesh: Mesh):
    """Place an existing host-side TrainState onto the mesh."""
    return jax.device_put(ts, train_state_shardings(ts, mesh))


def global_state_shardings(ts, mesh: Mesh):
    """Shardings for any trainer family's TrainState: env_state sharded on
    its leading (env) axis, a replay ring (if present) on its env axis
    (axis 1 of [R, E, ...]), everything else replicated.  Used by the
    multi-process CLI path (cli/train.py) to place the initial state onto a
    mesh that spans processes."""
    sh = replicate_tree(ts, mesh)
    if hasattr(ts, "env_state"):
        sh = sh.replace(env_state=shard_leading_axis(ts.env_state, mesh))
    if hasattr(ts, "replay"):
        sh = sh.replace(replay=shard_axis_tree(ts.replay, mesh, axis=1))
    return sh


def place_global(ts, mesh: Mesh):
    """Host-side TrainState -> global (possibly multi-process) placement."""
    return host_to_global(jax.device_get(ts), global_state_shardings(ts, mesh))


def shard_env_step(step_fn, mesh: Mesh):
    """Partition a batched env-step over the 'data' axis with shard_map.

    Env stepping is embarrassingly parallel over envs (no cross-env
    communication), but XLA's SPMD partitioner cannot split a pallas_call
    (the fused physics kernel) on its own - shard_map runs the kernel
    per-shard on each device's slice of the env batch, and the surrounding
    jit keeps auto-partitioning the learner around it."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(step_fn, mesh=mesh, in_specs=(P("data"), P("data")),
                     out_specs=P("data"), check_vma=False)
