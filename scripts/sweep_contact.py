"""Sweep ContactParams against the MuJoCo drop trajectory (one XLA compile:
the params ride as traced scalars).

JAX_PLATFORMS=cpu python scripts/sweep_contact.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import mujoco
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, scene_step
from scripts.xval_contact import mj_ant_with_plane, run_mj, H_MJ

T_S = 2.5
SUBSTEPS = int(os.environ.get("SUBSTEPS", "3"))


def main():
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    sys_ = model.system
    spec = AntSceneSpec(ant_sys=sys_, box_sys=None, box_half_extents=None,
                        num_ants=1, substeps=SUBSTEPS)
    h_ctrl = spec.dt
    T = int(T_S / h_ctrl)

    m = mj_ant_with_plane()
    mj, _ = run_mj(m, 1.0, int(T_S / H_MJ))
    t_o = np.arange(1, T + 1) * h_ctrl
    t_m = np.arange(1, len(mj) + 1) * H_MJ
    z_m = np.interp(t_o, t_m, mj[:, 2])
    land = np.argmax(z_m < 0.55)
    win = slice(max(land - 3, 0), int(0.9 / h_ctrl))

    hinge = jnp.asarray(model.init_hinge)
    qpos0 = jnp.concatenate([jnp.array([0.0, 0.0, 1.0]),
                             jnp.array([0.0, 0.0, 0.0, 1.0]), hinge])[None]
    state0 = AntSceneState(
        ant_qpos=qpos0, ant_qvel=jnp.zeros((1, sys_.nv)),
        box_qpos=jnp.zeros(7).at[6].set(1.0), box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((1, max(sys_.num_sensors, 1), 6)))

    @jax.jit
    def traj_z(kn, kd, hc, lk, ld):
        cp = engine.ContactParams(stiffness=kn, damping=kd,
                                  max_depen_vel=4.0, acc_units=True,
                                  hc_vel=hc)
        sp = spec._replace(contact=cp, limit_k=lk, limit_damp=ld)

        def body(s, _):
            s2 = scene_step(sp, s, jnp.zeros((1, sys_.nj)))
            return s2, s2.ant_qpos[0, 2]

        _, zs = jax.lax.scan(body, state0, None, length=T)
        return zs

    import itertools
    # acc-units sweep: kn in 1/s^2, damping ratio zeta (kd = 2*zeta*sqrt(kn))
    grid = itertools.product((50000.0, 100000.0, 200000.0),
                             (0.5, 1.0), (16000.0,), (0.25, 0.5, 1.0, 2.0))
    for kn, zeta, lk, hc in grid:
                kd = 2.0 * zeta * np.sqrt(kn)
                z = np.asarray(traj_z(jnp.asarray(kn), jnp.asarray(kd),
                                      jnp.asarray(hc), jnp.asarray(lk),
                                      jnp.asarray(20.0)))
                dip = z.min()
                rest = z[-30:].mean()
                terr = np.abs(z[win] - z_m[win]).max()
                print(f"kn={kn:8.0f} zeta={zeta:3.1f} hc={hc:4.2f}: "
                      f"dip {dip:.4f} ({100 * abs(dip - z_m.min()) / z_m.min():5.2f}%) "
                      f"rest {rest:.4f} ({100 * abs(rest - z_m[-30:].mean()) / z_m[-30:].mean():5.2f}%) "
                      f"transient {terr:.4f}", flush=True)
    print(f"mujoco: dip {z_m.min():.4f} rest {z_m[-30:].mean():.4f}")


if __name__ == "__main__":
    main()
