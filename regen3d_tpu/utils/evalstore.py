"""Evaluation persistence: timestamped run dirs + automatic comparison.

Reference contract (utils/eval_utils.py:22-130): each evaluation writes
output/evaluation/<YY_MM_DD_HHMMSS>/ with metrics.json, metrics.csv, a copy
of the config, and comparison.csv diffing against the previous run.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import yaml


def dump_evaluation(eval_root: str, metrics: Dict[str, float],
                    config_values: Optional[dict] = None,
                    timestamp: Optional[str] = None) -> str:
    ts = timestamp or time.strftime("%y_%m_%d_%H%M%S")
    out_dir = os.path.join(eval_root, ts)
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True)
    with open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for k in sorted(metrics):
            w.writerow([k, metrics[k]])
    if config_values is not None:
        with open(os.path.join(out_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(dict(config_values), f)

    prev = get_previous_evaluation(eval_root, exclude=ts)
    if prev is not None:
        compare_metrics_to_csv(prev, metrics,
                               os.path.join(out_dir, "comparison.csv"))
    return out_dir


def get_previous_evaluation(eval_root: str, exclude: Optional[str] = None
                            ) -> Optional[Dict[str, float]]:
    """Most recent earlier run's metrics (eval_utils.py:72-86)."""
    if not os.path.isdir(eval_root):
        return None
    runs = sorted(d for d in os.listdir(eval_root)
                  if os.path.isfile(os.path.join(eval_root, d, "metrics.json"))
                  and d != exclude)
    if not runs:
        return None
    with open(os.path.join(eval_root, runs[-1], "metrics.json")) as f:
        return json.load(f)


def compare_metrics_to_csv(prev: Dict[str, float], cur: Dict[str, float],
                           out_path: str) -> None:
    """metric, previous, current, delta, pct (eval_utils.py:89-130)."""
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "previous", "current", "delta", "pct_change"])
        for k in sorted(set(prev) | set(cur)):
            p = prev.get(k)
            c = cur.get(k)
            if p is None or c is None or not isinstance(p, (int, float)) \
                    or not isinstance(c, (int, float)):
                w.writerow([k, p, c, "", ""])
                continue
            delta = c - p
            pct = (delta / p * 100.0) if p != 0 else float("inf")
            w.writerow([k, p, c, delta, f"{pct:.2f}"])
