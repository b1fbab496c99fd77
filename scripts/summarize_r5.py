"""Collect the round-5 TPU campaign artifacts into BASELINE.md-ready tables.

Reads (whatever exists):
  results/profile_mappo_happo_r5.json    (schedule A/B + phase splits)
  results/bench_r5_local.json            (bench.py steady-state line)
  results/oneant_probe_r5_*.json         (peak-attribution probe curves)
  results/tenant_hc_r5_*.json            (impact-envelope learning curves)

Prints markdown tables + a one-line verdict per study.  Pure reporting -
no device work.
"""
from __future__ import annotations

import glob
import json
import os

R = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "results")


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def schedule_tables():
    p = _load(os.path.join(R, "profile_mappo_happo_r5.json"))
    if not p:
        print("[schedule] no profile_mappo_happo_r5.json yet")
        return
    print("### MAPPO-vs-HAPPO schedule A/B (E=%s, trusted harness)\n" % p.get("E"))
    print("| variant | iter ms | rollout ms | update ms | env-steps/s |")
    print("|---|---|---|---|---|")
    for e in (5, 1):
        for name in ("mappo_seq", "mappo_stacked", "happo"):
            t = f"{name}_e{e}"
            if f"{t}_iter_ms" not in p:
                continue
            print(f"| {name} (epochs={e}) | {p[f'{t}_iter_ms']} | "
                  f"{p.get(f'{t}_rollout_ms', '-')} | "
                  f"{p.get(f'{t}_update_ms', '-')} | "
                  f"{p[f'{t}_env_steps_per_sec']:,.0f} |")
    seq = p.get("mappo_seq_e5_env_steps_per_sec")
    hap = p.get("happo_e5_env_steps_per_sec")
    stk = p.get("mappo_stacked_e5_env_steps_per_sec")
    if seq and hap and stk:
        print(f"\nverdict: sequential {seq/stk - 1:+.1%} vs stacked; "
              f"sequential vs happo {seq/hap - 1:+.1%} "
              f"({'inversion CLOSED' if seq >= hap else 'inversion remains'})")


def oneant_table():
    rows = []
    for f in sorted(glob.glob(os.path.join(R, "oneant_probe_r5_*.json"))):
        d = _load(f)
        if d:
            rows.append(d)
    if not rows:
        print("[oneant] no probe results yet")
        return
    print("\n### OneAnt peak-attribution probe (6500 iters, E=128, "
          "Train2/mean_reward/step)\n")
    print("| run | first | median | last | max |")
    print("|---|---|---|---|---|")
    print("| reference shipped seed1 | 1.23 | -0.03 | 0.90 | 10.65 |")
    print("| reference shipped seed-1 (122 it) | 1.56 | 1.08 | 1.97 | 4.11 |")
    for d in rows:
        print(f"| ours {d['tag']} seed {d['seed']} | {d['first']:.2f} | "
              f"{d['median']:.2f} | {d['last']:.2f} | {d['max']:.2f} |")
    probe = [d for d in rows if d["tag"].startswith("antbox")]
    if probe:
        mx = max(d["max"] for d in probe)
        print(f"\nverdict: ant-box mu=0 probe max over "
              f"{len(probe)} seed(s) = {mx:.2f} "
              f"({'attribution CONFIRMED (multiply-band peak returns)' if mx >= 8 else 'peak does NOT return - attribution refuted/partial'})")


def hc_table():
    rows = []
    for f in sorted(glob.glob(os.path.join(R, "tenant_hc_r5_*.json"))):
        d = _load(f)
        if d:
            rows.append(d)
    if not rows:
        print("[hc] no sensitivity results yet")
        return
    print("\n### TenAnt+MAPPO under impact-envelope extremes "
          "(8000 iters, E=128, train_episode_rewards)\n")
    print("| variant | seed | first | median | last-quarter | max |")
    print("|---|---|---|---|---|---|")
    for d in sorted(rows, key=lambda d: (d["variant"], d["seed"])):
        print(f"| {d['variant']} | {d['seed']} | {d['ep_first']:.0f} | "
              f"{d['ep_median']:.0f} | {d['ep_last_quarter']:.0f} | "
              f"{d['ep_max']:.0f} |")
    by_var = {}
    for d in rows:
        by_var.setdefault(d["variant"], []).append(d["ep_last_quarter"])
    if len(by_var) > 1:
        means = {v: sum(x) / len(x) for v, x in by_var.items()}
        base = means.get("default")
        if base:
            spread = max(abs(m - base) / abs(base) for v, m in means.items()
                         if v != "default")
            print(f"\nverdict: last-quarter means {means}; max deviation from "
                  f"default {spread:.1%}")


def bench_line():
    p = _load(os.path.join(R, "bench_r5_local.json"))
    if p:
        print("\n### bench.py steady state (r5 local)\n")
        print(json.dumps(p))


if __name__ == "__main__":
    schedule_tables()
    oneant_table()
    hc_table()
    bench_line()
