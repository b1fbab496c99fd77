"""Post-hoc log tooling: tfevents -> csv conversion and run merging.

Counterpart of the reference's utils/logger/tools.py:43-105 (convert) and
the merge helper (tools.py:106+).  Works on both TensorBoard event files and
this framework's native metrics.csv.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List


def find_event_files(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.startswith("events.out.tfevents"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def read_tfevents(path: str) -> Dict[str, List[tuple]]:
    """tag -> [(wall_time, step, value)].  Uses the tensorboard reader that
    ships with torch."""
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
    acc = EventAccumulator(path, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        out[tag] = [(e.wall_time, e.step, e.value) for e in acc.Scalars(tag)]
    return out


def read_metrics_csv(path: str) -> Dict[str, List[tuple]]:
    out: Dict[str, List[tuple]] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            out.setdefault(row["tag"], []).append(
                (float(row["wall_time"]), int(row["step"]), float(row["value"])))
    return out


def convert_tfevents_to_csv(root: str, refresh: bool = False) -> List[str]:
    """Every run dir with tfevents gets a <tag>.csv next to it
    (tools.py:43-105)."""
    written = []
    for ev in find_event_files(root):
        run_dir = os.path.dirname(ev)
        data = read_tfevents(ev)
        for tag, rows in data.items():
            out_path = os.path.join(run_dir, tag.replace("/", "_") + ".csv")
            if os.path.exists(out_path) and not refresh:
                continue
            with open(out_path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["wall_time", "step", "value"])
                w.writerows(rows)
            written.append(out_path)
    return written


def merge_runs(csv_paths: List[str], out_path: str):
    """Merge per-seed csvs into one long-form csv with a seed column
    (tools.py merge helper)."""
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["run", "wall_time", "step", "value"])
        for p in csv_paths:
            run = os.path.basename(os.path.dirname(p))
            with open(p) as g:
                for row in csv.DictReader(g):
                    w.writerow([run, row["wall_time"], row["step"], row["value"]])
    return out_path
