"""Codec CLI — `python -m bitswap_tpu.codec --dataset mnist --nz 8 --bitswap 1`.

One entry point replaces the reference's per-dataset codec scripts'
__main__ blocks (mnist_compress.py:368-386 etc.), with the same flags.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bitswap_tpu.codec",
        description="Bit-Swap / BB-ANS compression experiment sweep",
    )
    # reference flags (mnist_compress.py:369-373)
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--nz", type=int, default=None)
    p.add_argument("--quantbits", type=int, default=10)
    p.add_argument("--bitswap", type=int, default=1, help="1 = Bit-Swap, 0 = BB-ANS")
    p.add_argument("--experiments", type=int, default=100)
    p.add_argument("--ndatapoints", type=int, default=100)
    p.add_argument("--verify", action="store_true",
                   help="decode back and assert round-trip + bits-back invariant "
                        "(the reference's decompress=True receiver, mnist_compress.py:277-358)")
    p.add_argument("--table-dtype", default="float32", choices=["float32", "float64"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--chunks", type=int, default=1,
                   help="wide-lane mode: split each experiment's datapoints "
                        "into N fresh-lane segments (~Nx faster sweeps; "
                        "sequential cma/restbits semantics preserved)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from bitswap_tpu.codec.experiment import run_experiments
    from bitswap_tpu.utils.registry import get_spec

    nz = args.nz or get_spec(args.dataset).default_nz
    result = run_experiments(
        dataset=args.dataset,
        nz=nz,
        quantbits=args.quantbits,
        bitswap=bool(args.bitswap),
        experiments=args.experiments,
        ndatapoints=args.ndatapoints,
        table_dtype=args.table_dtype,
        data_dir=args.data_dir,
        verify=args.verify,
        save=not args.no_save,
        chunks=args.chunks,
    )
    if result.verified is False:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
