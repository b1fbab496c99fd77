"""r5 impact-regime closure sweep (VERDICT r4 item 5).

The r4 multi-push table showed the hard-impact probe (2 ants at vx=-4 into
the 28-mass box) overshooting MuJoCo's box displacement by ~23% while the
quasi-static press agrees to sub-cm.  Hypothesized mechanism: the
Hunt-Crossley compression factor 1 - vn/hc_vel is ~9x at a 4 m/s impact
(hc_vel = 0.5), transferring more normal impulse than MuJoCo's solver.

This sweep measures, per hc_cap value (cap on that factor; 0 = uncapped
shipped default):
  - box dx error vs MuJoCo at vx = -4, -2, -1 (scenario_multi_push), and
  - the landing-dip / rest-height / transient regression of the drop
    scenario (the quasi-static anchor the r3 constants were tuned on).

Run:  JAX_PLATFORMS=cpu python scripts/impact_sweep_r5.py
Writes results/impact_sweep_r5.json; the chosen variant (if any) feeds the
TenAnt learning-sensitivity study (scripts/tpu_batch_r5.sh).
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from massive_marl_tpu.phys import engine

import xval_contact as XV


def main():
    caps = [0.0, 9.0, 5.0, 3.0, 2.0, 1.5, 1.0]
    out = {"caps": {}}
    for cap in caps:
        cp = engine.ContactParams(hc_cap=cap)
        row = {}
        for vx in (-4.0, -2.0, -1.0):
            r = XV.scenario_multi_push(vx=vx, cp=cp)
            dx_o, dx_m = r["dx"]
            row[f"vx{vx:g}"] = {"dx_ours": round(dx_o, 4), "dx_mj": round(dx_m, 4),
                                "err_pct_of_dx": round(100 * (dx_o - dx_m)
                                                       / abs(dx_m), 1)}
        d = XV.scenario_drop(cp=cp)
        row["drop"] = {"dip_ours": round(float(d["dip"][0]), 4),
                       "dip_mj": round(float(d["dip"][1]), 4),
                       "rest_ours": round(float(d["rest"][0]), 4),
                       "rest_mj": round(float(d["rest"][1]), 4),
                       "transient_max_dz": round(float(d["traj"]), 4)}
        out["caps"][str(cap)] = row
        print(f"== hc_cap={cap}: {json.dumps(row)}", flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/impact_sweep_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/impact_sweep_r5.json")


if __name__ == "__main__":
    main()
