"""Run the full-size-image benchmark (imagenetcrop_compress.py analog) and
the end-user demo codec once for real with the trained RGB model.

No real image corpus exists in this environment (zero egress), so the input
set is synthetic full-size RGB images from the same structured generator the
models train on, at varied 32-multiple resolutions — the classical-baseline
comparison (gzip/bz2/lzma/PNG/WebP vs BB-ANS vs Bit-Swap) is apples-to-
apples on identical inputs either way.

Writes runs/fullimage/results.json and exercises demo compress->decompress
round-trip on the largest image.  Usage: python - < scripts/run_fullimage.py
"""

import json
import os
import sys
import time

_here = globals().get("__file__", "")
if _here and __import__("os").path.isfile(_here):  # direct invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(_here))))
else:  # `python - < scripts/x.py` stdin runs: __file__ is "<stdin>"; use cwd
    sys.path.insert(0, os.getcwd())

import numpy as np
from PIL import Image

from bitswap_tpu.codec.fullimage import run_fullimage_benchmark
from bitswap_tpu.train.data import synthetic_images


def main():
    outdir = "runs/fullimage"
    imgdir = os.path.join(outdir, "inputs")
    os.makedirs(imgdir, exist_ok=True)

    # varied 32-multiple sizes, one synthetic RGB image each (seeded)
    rng = np.random.default_rng(100)
    sizes = [(int(h), int(w)) for h, w in zip(
        rng.choice([64, 96, 128, 160, 192], size=40),
        rng.choice([64, 96, 128, 160, 192], size=40),
    )]
    paths = []
    for i, (h, w) in enumerate(sizes):
        p = os.path.join(imgdir, f"img{i:03d}.png")
        if not os.path.exists(p):
            img = synthetic_images(1, (h, w, 3), seed=1000 + i)[0]
            Image.fromarray(img).save(p)
        paths.append(p)

    t0 = time.time()
    result = run_fullimage_benchmark(paths, n_images=len(paths))
    print(f"fullimage benchmark: {time.time()-t0:.0f}s", flush=True)

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "results.json"), "w") as f:
        json.dump({
            "n_images": result.n_images,
            "rates_bits_per_dim": result.rates,
            "note": "synthetic structured RGB inputs (no real corpus in env); "
                    "identical inputs for classical and learned codecs",
        }, f, indent=1)
    print(json.dumps(result.rates, indent=1))

    # demo end-user codec round trip on the largest input
    from bitswap_tpu.codec import demo

    biggest = max(paths, key=lambda p: os.path.getsize(p))
    t0 = time.time()
    out = demo.compress_file(biggest, os.path.join(outdir, "demo"))
    print(f"demo compress: {time.time()-t0:.0f}s -> {out}", flush=True)
    t0 = time.time()
    rec = demo.decompress_file(out)
    print(f"demo decompress: {time.time()-t0:.0f}s -> {rec.shape} verified", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
