"""Async checkpointing + auto-restore (SURVEY.md section 5 "Failure
detection / elastic recovery": the reference has none - crash = rerun,
resume = manual --model_dir, and optimizer state is lost).

Here: full train-state pytrees (params AND optimizer moments AND env rng)
serialize on a background thread so the device never waits on disk, with
keep-last-k rotation and crash-safe atomic renames.  `restore_latest` gives
preemption recovery: point the trainer at its logdir and it resumes from the
newest complete checkpoint.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable

import jax
from flax import serialization


class AsyncCheckpointer:
    def __init__(self, directory: str, keep: int = 3, prefix: str = "ckpt"):
        self.directory = directory
        self.keep = keep
        self.prefix = prefix
        os.makedirs(directory, exist_ok=True)
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}_{step}.ckpt")

    def save(self, step: int, tree: Any):
        """Non-blocking: device->host copy happens here (cheap, async under
        the hood), disk IO on the worker thread."""
        host_tree = jax.device_get(tree)
        self._q.put((step, host_tree))

    def _run(self):
        while True:
            step, tree = self._q.get()
            if step is None:
                break
            path = self._path(step)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(tree))
            os.replace(tmp, path)  # atomic: readers never see partial files
            self._gc()
            self._q.task_done()

    def _gc(self):
        import glob
        paths = sorted(glob.glob(os.path.join(self.directory, f"{self.prefix}_*.ckpt")),
                       key=os.path.getmtime)
        for p in paths[: -self.keep]:
            try:
                os.remove(p)
            except OSError:
                pass

    def wait(self):
        self._q.join()

    def close(self):
        self.wait()
        self._q.put((None, None))
        self._worker.join(timeout=5)


def restore_latest(directory: str, template: Any, prefix: str = "ckpt"):
    """Newest complete checkpoint restored into `template`'s structure, or
    None if the directory has none (fresh start)."""
    import glob
    paths = sorted(glob.glob(os.path.join(directory, f"{prefix}_*.ckpt")),
                   key=os.path.getmtime)
    if not paths:
        return None, None
    path = paths[-1]
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    step = int(os.path.basename(path).rsplit("_", 1)[1].split(".")[0])
    return restored, step


def atomic_write_bytes(path: str, blob: bytes):
    """Crash-safe file write: tmp + fsync + atomic os.replace.  A process
    killed mid-save (preemption, OOM) must never leave a truncated file at
    the checkpoint path - readers (restore_latest, --model_dir latest) see
    either the previous complete checkpoint or the new complete one."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
