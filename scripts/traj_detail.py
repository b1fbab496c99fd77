"""Print z(t) ours vs MuJoCo around the landing for one config."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, scene_step
from scripts.xval_contact import mj_ant_with_plane, run_mj, H_MJ

KN = float(os.environ.get("KN", "2e5"))
KD = float(os.environ.get("KD", "300"))
LK = float(os.environ.get("LK", "16000"))
LD = float(os.environ.get("LD", "20"))
SUBSTEPS = int(os.environ.get("SUBSTEPS", "3"))
T_S = 1.2

model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
sys_ = model.system
cp = engine.ContactParams(stiffness=KN, damping=KD)
spec = AntSceneSpec(ant_sys=sys_, box_sys=None, box_half_extents=None,
                    num_ants=1, substeps=SUBSTEPS, contact=cp,
                    limit_k=LK, limit_damp=LD)
h_ctrl = spec.dt
T = int(T_S / h_ctrl)

m = mj_ant_with_plane()
mj, _ = run_mj(m, 1.0, int(T_S / H_MJ))
t_m = np.arange(1, len(mj) + 1) * H_MJ

hinge = jnp.asarray(model.init_hinge)
qpos0 = jnp.concatenate([jnp.array([0.0, 0.0, 1.0]),
                         jnp.array([0.0, 0.0, 0.0, 1.0]), hinge])[None]
state = AntSceneState(ant_qpos=qpos0, ant_qvel=jnp.zeros((1, sys_.nv)),
                      box_qpos=jnp.zeros(7).at[6].set(1.0), box_qvel=jnp.zeros(6),
                      sensors=jnp.zeros((1, max(sys_.num_sensors, 1), 6)))
step = jax.jit(lambda s: scene_step(spec, s, jnp.zeros((1, sys_.nj))))
zs, ank = [], []
for i in range(T):
    state = step(state)
    zs.append(float(state.ant_qpos[0, 2]))
    ank.append(np.asarray(state.ant_qpos[0, 7:]))
t_o = np.arange(1, T + 1) * h_ctrl
z_m = np.interp(t_o, t_m, mj[:, 2])
a_m = np.stack([np.interp(t_o, t_m, mj[:, 7 + k]) for k in range(8)], 1)
ank = np.array(ank)
for i in range(T):
    if t_o[i] < 0.25 or t_o[i] > 0.95:
        continue
    if i % 3 == 0:
        print(f"t={t_o[i]:.3f} z_ours={zs[i]:.4f} z_mj={z_m[i]:.4f} "
              f"dz={zs[i] - z_m[i]:+.4f} ank_err={np.abs(ank[i] - a_m[i]).max():.4f}")
