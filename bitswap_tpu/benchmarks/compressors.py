"""Classical compressor baselines (gzip/bz2/lzma/PNG/WebP) + bits/dim metric.

Re-implements the reference's `benchmark_compress.py:64-103`:
- byte compressors run over the raw uint8 buffer of an image array;
- PNG counts only the IDAT chunk payloads (the reference's `pimg_compress`
  with PNG, benchmark_compress.py:84-87, strips container overhead so the
  comparison is entropy-coding only);
- WebP lossless counts the whole file;
- `bench_compressor(fn, images)` -> mean bits per dimension (pixel-channel).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
from typing import Callable, Iterable, Sequence

import numpy as np


def _as_bytes(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def gzip_compress(arr: np.ndarray) -> int:
    """Compressed size in bits (benchmark_compress.py:64-67)."""
    return len(gzip.compress(_as_bytes(arr), compresslevel=9)) * 8


def bz2_compress(arr: np.ndarray) -> int:
    return len(bz2.compress(_as_bytes(arr), compresslevel=9)) * 8


def lzma_compress(arr: np.ndarray) -> int:
    return len(lzma.compress(_as_bytes(arr))) * 8


def _to_pil(arr: np.ndarray):
    from PIL import Image

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return Image.fromarray(arr)


def _png_idat_bits(png_bytes: bytes) -> int:
    """Sum of IDAT chunk payload lengths, in bits (benchmark_compress.py:84-87:
    the reference counts only the entropy-coded payload of the PNG)."""
    assert png_bytes[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG stream"
    pos = 8
    total = 0
    while pos + 8 <= len(png_bytes):
        (length,) = struct.unpack(">I", png_bytes[pos : pos + 4])
        ctype = png_bytes[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            total += length
        pos += 12 + length  # len + type + payload + crc
        if ctype == b"IEND":
            break
    return total * 8


def png_compress(arr: np.ndarray) -> int:
    buf = io.BytesIO()
    _to_pil(arr).save(buf, format="PNG", optimize=True)
    return _png_idat_bits(buf.getvalue())


def webp_compress(arr: np.ndarray) -> int:
    buf = io.BytesIO()
    _to_pil(arr).save(buf, format="WebP", lossless=True, quality=100, method=6)
    return len(buf.getvalue()) * 8


def pimg_compress(fmt: str) -> Callable[[np.ndarray], int]:
    """Reference-style dispatcher: 'PNG' or 'WebP' -> size-in-bits fn."""
    fmt = fmt.upper()
    if fmt == "PNG":
        return png_compress
    if fmt == "WEBP":
        return webp_compress
    raise ValueError(f"unsupported image format {fmt!r}")


def bench_compressor(
    compress_fn: Callable[[np.ndarray], int], images: Iterable[np.ndarray]
) -> float:
    """Mean bits/dim of `compress_fn` over `images`
    (benchmark_compress.py:99-103)."""
    bits = []
    for img in images:
        img = np.asarray(img, dtype=np.uint8)
        bits.append(compress_fn(img) / img.size)
    return float(np.mean(bits))


ALL_COMPRESSORS = {
    "gzip": gzip_compress,
    "bz2": bz2_compress,
    "lzma": lzma_compress,
    "png": png_compress,
    "webp": webp_compress,
}


def run_baselines(
    images: Sequence[np.ndarray], which: Sequence[str] = ("gzip", "bz2", "lzma", "png", "webp")
):
    """bits/dim per scheme over the image set — the reference's __main__ sweep
    (benchmark_compress.py:105-174) as a function."""
    return {name: bench_compressor(ALL_COMPRESSORS[name], images) for name in which}
