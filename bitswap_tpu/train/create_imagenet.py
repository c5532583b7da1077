"""ImageNet32 data prep: folder of 32x32 images -> single uint8 `.npy`.

Equivalent of `model/create_imagenet.py:10-43`: reads every image in a
directory, validates shape/dtype/range, and stacks into one (N, 32, 32, 3)
uint8 array (HWC, the framework's canonical layout).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg")


def convert_path_to_npy(path: str, outfile: Optional[str] = None,
                        size: int = 32) -> np.ndarray:
    """Convert a directory of `size`x`size` RGB images to one .npy array."""
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith(_EXTS)
    )
    if not files:
        raise ValueError(f"no image files in {path}")
    out = np.zeros((len(files), size, size, 3), dtype=np.uint8)
    for i, f in enumerate(files):
        arr = np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
        # reference asserts shape/range (create_imagenet.py:24-28)
        assert arr.shape == (size, size, 3), f"{f}: {arr.shape} != ({size},{size},3)"
        assert arr.dtype == np.uint8 and arr.min() >= 0 and arr.max() <= 255
        out[i] = arr
    if outfile:
        np.save(outfile, out)
    return out


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="bitswap_tpu.train.create_imagenet",
        description="folder of 32x32 images -> uint8 .npy (model/create_imagenet.py)",
    )
    p.add_argument("src", help="directory of images")
    p.add_argument("dst", help="output .npy path")
    p.add_argument("--size", type=int, default=32)
    args = p.parse_args(argv)
    arr = convert_path_to_npy(args.src, args.dst, size=args.size)
    print(f"{arr.shape[0]} images -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
