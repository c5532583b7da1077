"""Host-side lane coder: native C++ core with numpy-golden fallback.

Same state machine and table layout as the TPU lane coder
(ans/vectorized.py) and the scalar golden reference (ans/reference.py), but
running on the host CPU — used by the demo file codec's pure-host path, by
container verification, and as a fast cross-check oracle in tests.  Streams
are bit-identical across all three implementations.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from bitswap_tpu import native
from bitswap_tpu.ans.reference import RefANS, RefState
from bitswap_tpu.ans.tables import PRECISION_BITS


class HostLanes:
    """L independent ANS streams in flat numpy buffers (mirrors LaneState).

    buf (L, capacity) uint32; sp (L,) int32; head (L,) uint64.
    """

    def __init__(self, num_lanes: int, capacity: int):
        self.buf = np.zeros((num_lanes, capacity), dtype=np.uint32)
        self.sp = np.zeros((num_lanes,), dtype=np.int32)
        self.head = np.zeros((num_lanes,), dtype=np.uint64)

    @property
    def num_lanes(self) -> int:
        return self.buf.shape[0]

    @property
    def capacity(self) -> int:
        return self.buf.shape[1]

    @staticmethod
    def from_ref_lists(states, capacity: int) -> "HostLanes":
        h = HostLanes(len(states), capacity)
        for lane, s in enumerate(states):
            words = np.asarray(s[:-1], dtype=np.uint32)
            assert words.size <= capacity
            h.buf[lane, : words.size] = words
            h.sp[lane] = words.size
            h.head[lane] = np.uint64(int(s[-1]))
        return h

    def to_ref_lists(self) -> List[list]:
        return [
            list(map(int, self.buf[l, : self.sp[l]])) + [int(self.head[l])]
            for l in range(self.num_lanes)
        ]


def _check_cdf(cdf: np.ndarray, lanes: int, seq: int) -> np.ndarray:
    cdf = np.ascontiguousarray(cdf, dtype=np.uint32)
    assert cdf.ndim == 3 and cdf.shape[0] == lanes and cdf.shape[1] == seq
    return cdf


def encode_lanes(state: HostLanes, cdf: np.ndarray, symbols: np.ndarray) -> None:
    """In-place encode of one (L, seq) symbol batch; cdf (L, seq, support+1)."""
    symbols = np.ascontiguousarray(symbols, dtype=np.int32)
    lanes, seq = symbols.shape
    cdf = _check_cdf(cdf, lanes, seq)
    lib = native.load()
    if lib is not None:
        import ctypes

        rc = lib.bsans_encode_lanes(
            state.buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            state.sp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            state.head.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lanes, seq, cdf.shape[2],
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            state.capacity,
        )
        if rc != 0:
            raise OverflowError("ANS stream buffer capacity exhausted")
        return
    # numpy-golden fallback
    for l in range(lanes):
        pmf = cdf[l, :, 1:].astype(np.uint64) - cdf[l, :, :-1].astype(np.uint64)
        rs = RefState(words=list(map(int, state.buf[l, : state.sp[l]])),
                      head=int(state.head[l]))
        RefANS(pmf, cdf[l]).encode(rs, symbols[l])
        if len(rs.words) > state.capacity:
            raise OverflowError("ANS stream buffer capacity exhausted")
        state.buf[l, : len(rs.words)] = np.asarray(rs.words, dtype=np.uint32)
        state.sp[l] = len(rs.words)
        state.head[l] = np.uint64(rs.head)


def decode_lanes(state: HostLanes, cdf: np.ndarray) -> np.ndarray:
    """In-place decode; returns symbols (L, seq) int32."""
    lanes = state.num_lanes
    seq = cdf.shape[1]
    cdf = _check_cdf(cdf, lanes, seq)
    out = np.zeros((lanes, seq), dtype=np.int32)
    lib = native.load()
    if lib is not None:
        import ctypes

        rc = lib.bsans_decode_lanes(
            state.buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            state.sp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            state.head.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lanes, seq, cdf.shape[2],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            state.capacity,
        )
        if rc != 0:
            raise IndexError("ANS stream stack underflow")
        return out
    for l in range(lanes):
        pmf = cdf[l, :, 1:].astype(np.uint64) - cdf[l, :, :-1].astype(np.uint64)
        rs = RefState(words=list(map(int, state.buf[l, : state.sp[l]])),
                      head=int(state.head[l]))
        out[l] = RefANS(pmf, cdf[l]).decode(rs)
        state.buf[l, : len(rs.words)] = np.asarray(rs.words, dtype=np.uint32)
        state.sp[l] = len(rs.words)
        state.head[l] = np.uint64(rs.head)
    return out
