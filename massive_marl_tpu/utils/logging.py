"""Metrics writer: TensorBoard when available, CSV always.

Replaces the reference's per-trainer SummaryWriter usage (ppo.py:79,195-205;
marl/runner.py:69,257-263).  Metrics are pulled host-side once per iteration -
never inside jit - so logging cannot stall the device.

The tfevents backend is the native C++ writer (native/tbevents.cc) - no
torch import on the training path; torch's SummaryWriter is the fallback
when the native toolchain is unavailable.
"""
from __future__ import annotations

import csv
import os
import time


def fetch_metrics(metrics: dict) -> dict:
    """Pull a dict of device scalars to host floats with ONE transfer.

    `float(v)` per metric costs one host round-trip each (~43 ms over the
    axon tunnel); stacking first makes logging O(1) round-trips per
    iteration regardless of how many scalars a trainer logs."""
    import jax
    import jax.numpy as jnp
    keys = list(metrics.keys())
    vals = jax.device_get(jnp.stack([jnp.asarray(metrics[k], jnp.float32) for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}


class Writer:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if use_tensorboard:
            try:
                from massive_marl_tpu.native import TBEventWriter
                self._tb = TBEventWriter(log_dir)
            except Exception:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir=log_dir, flush_secs=30)
                except Exception:
                    self._tb = None
        self._csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv = csv.writer(self._csv_file)
        if os.path.getsize(self._csv_path) == 0:
            self._csv.writerow(["wall_time", "step", "tag", "value"])

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._csv.writerow([f"{time.time():.3f}", step, tag, f"{value:.6g}"])

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        self._csv_file.flush()

    def close(self):
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._csv_file.close()
