"""massive_marl_tpu: a TPU-native massive multi-agent RL framework.

From-scratch JAX/XLA re-design of SafeRL-Lab/Massive-MARL-Benchmark: batched
rigid-body physics, multi-agent ant/helicopter tasks, and a zoo of SARL /
MARL / MTRL / meta-RL / offline-RL algorithms, all jit-compiled end to end.
"""
__version__ = "0.1.0"

from massive_marl_tpu.utils.package_utils import make  # noqa: F401
