"""Per-latent-layer bits/dim stack plots from training metric logs.

Equivalent of the reference's `plots/stackplot.py:22-66`, which consumes
tensorboard CSV exports `x.csv`/`z{i}.csv`.  Our training runtime logs the
same per-layer scalars (recon bits + per-layer KL bits) to the JSONL metric
log (utils/logging.py), so this reads either source:

- a JSONL file with records containing `step`, `bits/x`, `bits/z{i}`;
- a directory of reference-style CSVs (`x.csv`, `z1.csv`, ...).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _read_jsonl(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    steps: List[float] = []
    series: Dict[str, List[float]] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            # accept prefixed keys ("train/bits/z1" etc.)
            keys = [k for k in rec if "bits/" in k]
            if not keys:
                continue
            steps.append(rec.get("step", len(steps)))
            for k in keys:
                name = "bits/" + k.split("bits/")[-1]
                series.setdefault(name, []).append(float(rec[k]))
    n = len(steps)
    return np.asarray(steps), {k: np.asarray(v[:n]) for k, v in series.items()}


def _read_csv_dir(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Reference-style tensorboard CSV exports: columns Wall time, Step,
    Value (plots/stackplot.py:22-33)."""
    series: Dict[str, np.ndarray] = {}
    steps = None
    for fname in sorted(os.listdir(path)):
        stem, ext = os.path.splitext(fname)
        if ext != ".csv" or not (stem == "x" or stem.startswith("z")):
            continue
        rows = list(csv.DictReader(open(os.path.join(path, fname))))
        vals = np.asarray([float(r["Value"]) for r in rows])
        series["bits/" + stem] = vals
        if steps is None:
            steps = np.asarray([float(r["Step"]) for r in rows])
    if steps is None:
        raise ValueError(f"no x.csv / z*.csv in {path}")
    n = min(len(steps), *(len(v) for v in series.values()))
    return steps[:n], {k: v[:n] for k, v in series.items()}


def stackplot(source: str, out: Optional[str] = None, title: str = ""):
    """Stacked per-layer bits/dim over training (plots/stackplot.py:36-66)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, series = (
        _read_jsonl(source) if os.path.isfile(source) else _read_csv_dir(source)
    )

    def order(k: str):
        return (0, 0) if k == "bits/x" else (1, int(k.split("z")[-1]))

    keys = sorted(series, key=order)
    data = np.vstack([series[k] for k in keys])
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.stackplot(steps[: data.shape[1]], data, labels=keys, alpha=0.85)
    ax.set_xlabel("step")
    ax.set_ylabel("bits/dim")
    if title:
        ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    out = out or (os.path.splitext(source)[0] + "_stack.png"
                  if os.path.isfile(source) else os.path.join(source, "stack.png"))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="bitswap_tpu.plots.stackplot")
    p.add_argument("source", help="JSONL metrics file or directory of CSVs")
    p.add_argument("--out", default=None)
    p.add_argument("--title", default="")
    args = p.parse_args(argv)
    print(f"plot -> {stackplot(args.source, args.out, args.title)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
