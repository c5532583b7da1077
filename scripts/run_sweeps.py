"""Run the full compression-experiment sweep suite over all trained configs.

The reference runs one (dataset, nz, scheme) sweep per script invocation
(mnist_compress.py:368-386); here one process sweeps every config that has
a trained checkpoint, both schemes, with the receiver verification pass
(the reference's decompress=True path, mnist_compress.py:277-358) enabled —
then prints the results table (plots/cma.py analog).

Usage:  python - < scripts/run_sweeps.py          (axon env quirk: -/stdin)
   or:  python scripts/run_sweeps.py --experiments 100 --ndatapoints 100
"""

import argparse
import os
import sys
import time

_here = globals().get("__file__", "")
if _here and __import__("os").path.isfile(_here):  # direct invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(_here))))
else:  # `python - < scripts/x.py` stdin runs: __file__ is "<stdin>"; use cwd
    sys.path.insert(0, os.getcwd())

CONFIGS = [
    ("mnist", 1), ("mnist", 2), ("mnist", 4), ("mnist", 8),
    ("cifar", 1), ("cifar", 2), ("cifar", 4), ("cifar", 8),
    ("imagenet", 2), ("imagenet", 4),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", type=int, default=100)
    ap.add_argument("--ndatapoints", type=int, default=100)
    ap.add_argument("--only", default=None, help="comma list like mnist4,cifar2")
    ap.add_argument("--chunks", type=int, default=1,
                    help="wide-lane mode: split each experiment's datapoints "
                         "into N fresh-lane segments (N*experiments lanes; "
                         "~Nx faster on weight-bound models)")
    args = ap.parse_args(argv)

    from bitswap_tpu.codec.experiment import run_experiments
    from bitswap_tpu.plots.cma import table_rows

    only = set(args.only.split(",")) if args.only else None
    ran = []
    for ds, nz in CONFIGS:
        tag = f"{ds}{nz}"
        if only and tag not in only:
            continue
        ckpt = os.path.join("params", ds, f"nz{nz}.msgpack")
        if not os.path.exists(ckpt):
            print(f"[{tag}] no checkpoint; skipping", flush=True)
            continue
        for bitswap in (True, False):
            scheme = "bitswap" if bitswap else "bbans"
            t0 = time.time()
            print(f"[{tag}/{scheme}] starting "
                  f"{args.experiments}x{args.ndatapoints}", flush=True)
            res = run_experiments(
                ds, nz, bitswap=bitswap, experiments=args.experiments,
                ndatapoints=args.ndatapoints, verify=True, chunks=args.chunks,
            )
            print(f"[{tag}/{scheme}] done in {time.time()-t0:.0f}s: "
                  f"{res.summary()}", flush=True)
            assert res.verified, f"{tag}/{scheme} round-trip FAILED"
            ran.append((tag, scheme))

    print(f"\ncompleted {len(ran)} sweeps")
    print(table_rows())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
