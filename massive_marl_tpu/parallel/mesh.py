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
                     process_id: Optional[int] = None):
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


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
