"""Compare a training run's learning curve against the reference's SHIPPED
tfevents runs (the only quantitative results in the reference repo:
logs/OneAnt/ppo/* and logs/ten_ant/mappo/*).

Usage:
  python scripts/compare_reference_curves.py /tmp/val_oneant_ppo

Prints first/quartile/max summary of the shared tags so curves can be judged
"within seed variance" (BASELINE.md env-fidelity target).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from massive_marl_tpu.utils.logger.tools import find_event_files, read_tfevents

REF_ONEANT = "/root/reference/logs/OneAnt/ppo/ppo_seed1"


def summarize(rows):
    vals = [v for _, _, v in rows]
    n = len(vals)
    if not n:
        return "empty"
    q = lambda f: vals[min(int(f * n), n - 1)]
    return (f"n={n:6d} first={vals[0]:8.2f} q25={q(0.25):8.2f} q50={q(0.5):8.2f} "
            f"q75={q(0.75):8.2f} last={vals[-1]:8.2f} max={max(vals):8.2f}")


def load(root):
    out = {}
    for f in find_event_files(root):
        for tag, rows in read_tfevents(f).items():
            out.setdefault(tag, []).extend(rows)
    for tag in out:
        out[tag].sort(key=lambda r: r[1])
    return out


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/val_oneant_ppo"
    ours = load(run_dir)
    ref = load(REF_ONEANT)
    print(f"=== ours ({run_dir}) ===")
    for tag in sorted(ours):
        print(f"{tag:40s} {summarize(ours[tag])}")
    print(f"=== reference ({REF_ONEANT}) ===")
    for tag in sorted(ref):
        if "time" in tag:
            continue
        print(f"{tag:40s} {summarize(ref[tag])}")


if __name__ == "__main__":
    main()
