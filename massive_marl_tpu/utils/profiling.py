"""Tracing / profiling utilities (SURVEY.md section 5: the reference has only
wall-clock FPS prints, ppo.py:160-171; here profiling is first-class).

- `trace(logdir)`: context manager around jax.profiler for device traces
  viewable in TensorBoard / Perfetto.
- `PhaseTimer`: accumulating per-phase wall-clock splits (collection vs
  learning vs logging), the structured version of the reference's
  collection_time/learn_time locals.
- `assert_finite`: checkify-style NaN guard for debugging physics blowups.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1000:.1f}ms"
            for k in sorted(self.totals))

    def fps(self, name: str, steps_per_call: int) -> float:
        t = self.totals[name] / max(self.counts[name], 1)
        return steps_per_call / t if t > 0 else 0.0


def measure_rtt(n: int = 10) -> float:
    """Host<->device round-trip latency of a tiny fetch (on the axon remote
    runtime this is ~40 ms and must be subtracted from fetch-synced timings)."""
    import jax.numpy as jnp
    x = jnp.zeros(())
    float(x + 1.0)
    t0 = time.perf_counter()
    for i in range(n):
        float(x + float(i))
    return (time.perf_counter() - t0) / n


def time_scanned(step_fn, init_carry, n: int = 20, warmup: int = 2,
                 rtt: float | None = None) -> float:
    """Trustworthy per-call device time of `carry -> carry` step_fn.

    On the axon backend `jax.block_until_ready` returns WITHOUT waiting, so
    python-loop timings measure dispatch, not execution (validated against a
    known-cost 8192^3 matmul: 0.036 ms "measured" vs 5.6 ms actual).  The only
    real barrier is a host fetch of a value that data-depends on the result.
    This helper scans step_fn n times device-side, fetches a scalar reduced
    from the final carry, and subtracts the fetch round-trip.
    """
    import jax.numpy as jnp

    @jax.jit
    def run(carry):
        carry = jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=n)[0]
        leaves = [jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(carry)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
        return carry, sum(leaves[:4])

    carry = init_carry
    for _ in range(warmup):
        carry, probe = run(carry)
        float(probe)
    if rtt is None:
        rtt = measure_rtt()
    t0 = time.perf_counter()
    _, probe = run(carry)
    float(probe)
    return (time.perf_counter() - t0 - rtt) / n


def assert_finite(tree, name: str = "tree"):
    """Host-side NaN/Inf check on a pytree (debug tool, not for jit loops)."""
    import jax.numpy as jnp
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
