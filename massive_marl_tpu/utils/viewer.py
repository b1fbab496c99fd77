"""Host-side trajectory visualizer (SURVEY.md section 5 "Viewer/rendering").

The reference uses the IsaacGym interactive viewer (base_task.py:90-109);
off the hot path we render downloaded trajectories instead: top-down ant/box
tracks and a simple frame renderer, written as PNGs/GIFs.

Usage:
    from massive_marl_tpu.utils.viewer import render_topdown
    render_topdown(traj_ant_xy, traj_box_xy, out="episode.png")
"""
from __future__ import annotations

import numpy as np


def render_topdown(ant_xy, box_xy=None, goals=None, out: str = "episode.png",
                   arena=((-20, 20), (-20, 20))):
    """ant_xy: [T, A, 2]; box_xy: [T, 2] or None; goals: [A, 2] or None."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ant_xy = np.asarray(ant_xy)
    T, A, _ = ant_xy.shape
    fig, ax = plt.subplots(figsize=(6, 6))
    cmap = plt.get_cmap("tab10")
    for a in range(A):
        ax.plot(ant_xy[:, a, 0], ant_xy[:, a, 1], color=cmap(a % 10), lw=1.0,
                alpha=0.8, label=f"ant {a}" if A <= 10 else None)
        ax.scatter(ant_xy[-1, a, 0], ant_xy[-1, a, 1], color=cmap(a % 10), s=25,
                   zorder=3)
    if box_xy is not None:
        box_xy = np.asarray(box_xy)
        ax.plot(box_xy[:, 0], box_xy[:, 1], "k--", lw=1.5, label="box")
        ax.scatter(box_xy[-1, 0], box_xy[-1, 1], c="k", marker="s", s=60, zorder=3)
    if goals is not None:
        goals = np.asarray(goals)
        ax.scatter(goals[:, 0], goals[:, 1], marker="x", c="red", s=40, label="goals")
    ax.set_xlim(*arena[0])
    ax.set_ylim(*arena[1])
    ax.set_aspect("equal")
    ax.grid(alpha=0.3)
    if A <= 10:
        ax.legend(fontsize=7, loc="upper right")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    import matplotlib.pyplot as plt2
    plt2.close(fig)
    return out


def record_episode(env, policy_fn, n_steps: int = 200, seed: int = 0):
    """Roll one episode and return (ant_xy [T,A,2], box_xy [T,2] | None)."""
    import jax
    import jax.numpy as jnp

    state = env.reset(jax.random.PRNGKey(seed))

    def step(carry, _):
        st = carry
        a = policy_fn(st.obs)
        st = env.step(st, a)
        ant = st.pipeline.ant_qpos[:, 0:2] if hasattr(st.pipeline, "ant_qpos") \
            else st.pipeline.qpos[:, 0:2]
        box = st.pipeline.box_qpos[0:2] if hasattr(st.pipeline, "box_qpos") \
            else jnp.zeros(2)
        return st, (ant, box)

    _, (ant_xy, box_xy) = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=n_steps))(state)
    return np.asarray(ant_xy), np.asarray(box_xy)
