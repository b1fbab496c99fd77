"""Test-session JAX config.

- Tests always run on CPU with a virtual 8-device mesh so multi-chip sharding
  is exercised without TPU hardware (SURVEY.md section 4 item 4).
- A persistent compilation cache keeps reruns fast on this small host.
Must execute before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# /root/.axon_site/sitecustomize.py imports jax at interpreter startup, which
# latches JAX_PLATFORMS=axon before this file runs - override via the config
# API as well.
import jax

jax.config.update("jax_platforms", "cpu")
