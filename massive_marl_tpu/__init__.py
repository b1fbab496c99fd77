"""massive_marl_tpu: a TPU-native massive multi-agent RL framework.

From-scratch JAX/XLA re-design of SafeRL-Lab/Massive-MARL-Benchmark: batched
rigid-body physics, multi-agent ant/helicopter tasks, and a zoo of SARL /
MARL / MTRL / meta-RL / offline-RL algorithms, all jit-compiled end to end.
"""
__version__ = "0.1.0"

import os as _os

# persistent XLA compilation cache (fresh remote-TPU compiles of a full train
# step cost 10-40 min on tunneled runtimes; cached reruns are seconds).  The
# env var alone is not enough when jax was already initialized by the runtime,
# so also set the live config option.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.jax_cache"))
import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])

from massive_marl_tpu.utils.package_utils import make  # noqa: F401
