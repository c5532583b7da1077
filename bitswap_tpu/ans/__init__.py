from bitswap_tpu.ans.tables import quantize_pmfs, build_tables_from_cdf
from bitswap_tpu.ans.reference import RefANS, fresh_state
from bitswap_tpu.ans.vectorized import (
    LaneState,
    init_lane_state,
    ans_encode_lanes,
    ans_decode_lanes,
)

__all__ = [
    "quantize_pmfs",
    "build_tables_from_cdf",
    "RefANS",
    "fresh_state",
    "LaneState",
    "init_lane_state",
    "ans_encode_lanes",
    "ans_decode_lanes",
]
