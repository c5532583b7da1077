"""Cumulative-moving-average curves + results table from experiment arrays.

Equivalent of the reference's `plots/cma.py`: loads the
`plots/{ds}{nz}/{scheme}_{qb}bits_{nets,elbos,cmas,total}.npy` artifacts the
experiment harness writes (same naming as the reference,
mnist_compress.py:363-366), plots the CMA bits/dim with error bands per
scheme, and prints a results-table row per configuration (including the
MNIST 32^2/28^2 padding rescale, plots/cma.py:28-31).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# MNIST is padded 28->32 before modelling; published rates are per ORIGINAL
# dim (plots/cma.py:28) — applied ONLY when the data actually was padded
# (the experiment harness records this in plots/{ds}{nz}/meta.json;
# synthetic data is generated natively at the model frame, so its rates are
# already per true dim)
MNIST_RESCALE = (32 * 32) / (28 * 28)


def rate_scale(plots_dir: str, dataset: str, nz: int) -> float:
    """32^2/28^2 iff the run's meta.json says the data was padded up to the
    model frame; 1.0 otherwise (including legacy dirs with no sidecar —
    every committed artifact is native-32^2 synthetic)."""
    meta = os.path.join(plots_dir, f"{dataset}{nz}", "meta.json")
    if os.path.exists(meta):
        import json

        with open(meta) as f:
            if json.load(f).get("padded", False):
                return MNIST_RESCALE
    return 1.0


def load_arrays(plots_dir: str, dataset: str, nz: int, scheme: str, quantbits: int = 10):
    d = os.path.join(plots_dir, f"{dataset}{nz}")
    out = {}
    for kind in ("nets", "elbos", "cmas", "total"):
        path = os.path.join(d, f"{scheme}_{quantbits}bits_{kind}.npy")
        out[kind] = np.load(path) if os.path.exists(path) else None
    return out


def table_rows(
    plots_dir: str = "plots",
    datasets: Sequence[str] = ("mnist", "cifar", "imagenet"),
    nzs: Sequence[int] = (1, 2, 4, 8),
    quantbits: int = 10,
) -> str:
    """Results table over all available configs (reference prints LaTeX rows,
    plots/cma.py:58-61; we print aligned text with the same numbers)."""
    lines = [f"{'dataset':<10} {'nz':>3} {'scheme':<8} {'net b/d':>8} "
             f"{'elbo b/d':>9} {'D':>8} {'cma@end':>8}"]
    for ds in datasets:
        for nz in nzs:
            scale = rate_scale(plots_dir, ds, nz)
            for scheme in ("bitswap", "bbans"):
                arrs = load_arrays(plots_dir, ds, nz, scheme, quantbits)
                if arrs["nets"] is None:
                    continue
                net = arrs["nets"].mean() * scale
                elbo = arrs["elbos"].mean() * scale if arrs["elbos"] is not None else np.nan
                cma = arrs["cmas"][:, -1].mean() * scale if arrs["cmas"] is not None else np.nan
                lines.append(
                    f"{ds:<10} {nz:>3} {scheme:<8} {net:8.4f} {elbo:9.4f} "
                    f"{net - elbo:8.4f} {cma:8.4f}"
                )
    return "\n".join(lines)


def plot_cma(
    plots_dir: str = "plots",
    dataset: str = "mnist",
    nz: int = 8,
    quantbits: int = 10,
    out: Optional[str] = None,
):
    """CMA curves with +-1 std bands for Bit-Swap vs BB-ANS
    (plots/cma.py:33-56)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scale = rate_scale(plots_dir, dataset, nz)
    fig, ax = plt.subplots(figsize=(6, 4))
    for scheme, color in (("bitswap", "tab:blue"), ("bbans", "tab:orange")):
        arrs = load_arrays(plots_dir, dataset, nz, scheme, quantbits)
        if arrs["cmas"] is None:
            continue
        cma = arrs["cmas"] * scale  # (experiments, datapoints)
        t = np.arange(1, cma.shape[1] + 1)
        mean, std = cma.mean(axis=0), cma.std(axis=0)
        ax.plot(t, mean, color=color, label=scheme)
        ax.fill_between(t, mean - std, mean + std, color=color, alpha=0.25)
    ax.set_xlabel("datapoints")
    ax.set_ylabel("cumulative bits/dim")
    ax.set_title(f"{dataset} nz={nz}")
    ax.legend()
    fig.tight_layout()
    out = out or os.path.join(plots_dir, f"{dataset}{nz}_cma.png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="bitswap_tpu.plots.cma")
    p.add_argument("--plots-dir", default="plots")
    p.add_argument("--dataset", default=None, help="also render the CMA plot for this dataset")
    p.add_argument("--nz", type=int, default=8)
    p.add_argument("--quantbits", type=int, default=10)
    args = p.parse_args(argv)
    print(table_rows(args.plots_dir, quantbits=args.quantbits))
    if args.dataset:
        out = plot_cma(args.plots_dir, args.dataset, args.nz, args.quantbits)
        print(f"plot -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
