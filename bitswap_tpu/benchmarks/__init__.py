"""Classical-compressor baselines and benchmark harness.

Equivalent of the reference's `benchmark_compress.py`: gzip/bz2/lzma byte
compressors, PNG/WebP image compressors, the bits/dim `bench_compressor`
metric, and the seeded dataset samplers used by the experiment sweeps.
"""

from bitswap_tpu.benchmarks.compressors import (
    bench_compressor,
    bz2_compress,
    gzip_compress,
    lzma_compress,
    pimg_compress,
    png_compress,
    webp_compress,
)

__all__ = [
    "bench_compressor",
    "gzip_compress",
    "bz2_compress",
    "lzma_compress",
    "pimg_compress",
    "png_compress",
    "webp_compress",
]
