from bitswap_tpu.codec.discretize import discretize_bins, DiscretizationBins
from bitswap_tpu.codec.bitswap import (
    CodecConfig,
    make_codec,
)
from bitswap_tpu.codec.blocks import extract_blocks, unextract_blocks

__all__ = [
    "discretize_bins",
    "DiscretizationBins",
    "CodecConfig",
    "make_codec",
    "extract_blocks",
    "unextract_blocks",
]
