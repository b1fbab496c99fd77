"""Task registry + env construction (reference parse_task.py:25-165 +
package_utils.make, agents/utils/package_utils.py:20-56)."""
from __future__ import annotations

from massive_marl_tpu.utils import config as cfg_mod


def task_class(name: str):
    if name == "OneAnt":
        from massive_marl_tpu.envs.one_ant import OneAntEnv
        return OneAntEnv
    if name == "TenAnt":
        from massive_marl_tpu.envs.ten_ant import TenAntEnv
        return TenAntEnv
    if name == "MultiAntCircle":
        from massive_marl_tpu.envs.multi_ant_circle import MultiAntCircleEnv
        return MultiAntCircleEnv
    if name == "MultiIngenuity":
        from massive_marl_tpu.envs.multi_ingenuity import MultiIngenuityEnv
        return MultiIngenuityEnv
    raise ValueError(f"unknown task {name}")


def is_multi_agent(algo: str) -> bool:
    return algo in cfg_mod.MARL_ALGOS


def build_env(task: str, cfg: dict, multi_agent: bool):
    """Construct the functional env.  OneAnt is always single-agent; ant tasks
    expose a joint-action interface when driven by SARL algos (is_multi_agent
    False), matching parse_task.py:58-93."""
    cls = task_class(task)
    env = cls(cfg)
    return env


def make_env(task: str, algo: str = "ppo", num_envs: int | None = None,
             seed: int = 0, **overrides):
    """Library API: a ready vectorized env (agents.make equivalent,
    package_utils.py:20-56; demo loop train_customize.py:1-13)."""
    import yaml, os
    cfg_env_path = os.path.join(cfg_mod.CFG_ROOT, f"{task}.yaml")
    with open(cfg_env_path) as f:
        cfg = yaml.safe_load(f)
    if overrides:
        cfg["env"].update(overrides)
    E = num_envs or cfg["env"].get("numEnvs", 128)
    env = build_env(task, cfg, is_multi_agent(algo))
    from massive_marl_tpu.wrap.vec_task import MultiVecTaskPython, VecTaskPython
    if is_multi_agent(algo) and env.num_agents > 1:
        return MultiVecTaskPython(env, num_envs=E, seed=seed)
    return VecTaskPython(env, num_envs=E, seed=seed)
