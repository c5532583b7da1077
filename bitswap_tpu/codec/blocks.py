"""Pixel-block extraction for full-size images.

Equivalent of the reference's `extract_blocks`/`unextract_blocks`
(benchmark_compress.py:20-39): crop an (H, W, C) image to multiples of the
block size and reshape into a grid of (bh, bw, C) blocks.  Blocks are the
codec's unit of spatial scaling — and, in the pod-parallel encoder, the unit
of data parallelism (imagenetcrop_compress.py:127-129 codes them serially
through one stream; parallel/ shards them across lanes and chips).
"""

from __future__ import annotations

import numpy as np


def extract_blocks(arr: np.ndarray, block_size=(32, 32)):
    """Returns (blocks (N, bh, bw, C), cropped_h, cropped_w)."""
    nrows, ncols = block_size
    h, w, c = arr.shape
    if h % nrows != 0:
        h -= h % nrows
        arr = arr[:h]
    if w % ncols != 0:
        w -= w % ncols
        arr = arr[:, :w]
    blocks = (
        arr.reshape(h // nrows, nrows, -1, ncols, c)
        .swapaxes(1, 2)
        .reshape(-1, nrows, ncols, c)
    )
    return blocks, h, w


def unextract_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    """Inverse: (N, bh, bw, C) + cropped dims -> (h, w, C)."""
    n, nrows, ncols, c = blocks.shape
    return (
        blocks.reshape(h // nrows, -1, nrows, ncols, c).swapaxes(1, 2).reshape(h, w, c)
    )
