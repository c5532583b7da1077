"""Native C++ ANS core: bit-exact equivalence with the golden coder."""

import numpy as np
import pytest

from bitswap_tpu import native
from bitswap_tpu.ans.host import HostLanes, decode_lanes, encode_lanes
from bitswap_tpu.ans.reference import RefANS, RefState, fresh_state
from bitswap_tpu.ans.tables import PRECISION_BITS, TOTAL_MASS


def _random_tables(rng, lanes, seq, support):
    """Integer tables with rows summing to exactly 2**31."""
    raw = rng.integers(1, 1000, size=(lanes, seq, support)).astype(np.float64)
    raw /= raw.sum(axis=-1, keepdims=True)
    pmf = np.floor(raw * (TOTAL_MASS - support)).astype(np.uint64) + 1
    rem = TOTAL_MASS - pmf.sum(axis=-1)
    idx = pmf.argmax(axis=-1)
    for l in range(lanes):
        for i in range(seq):
            pmf[l, i, idx[l, i]] += rem[l, i]
    cdf = np.zeros((lanes, seq, support + 1), dtype=np.uint64)
    cdf[..., 1:] = np.cumsum(pmf, axis=-1)
    assert (cdf[..., -1] == TOTAL_MASS).all()
    return pmf, cdf.astype(np.uint32)


def test_native_builds():
    assert native.available(), "g++ toolchain present in image; native core must build"


def test_native_roundtrip_matches_golden():
    rng = np.random.default_rng(0)
    lanes, seq, support = 3, 64, 128
    pmf, cdf = _random_tables(rng, lanes, seq, support)
    syms = rng.integers(0, support, size=(lanes, seq)).astype(np.int32)

    # host-lane (native) path
    init = [fresh_state(seed=100 + l, nwords=32).to_reference_list() for l in range(lanes)]
    st = HostLanes.from_ref_lists(init, capacity=4096)
    for _ in range(3):
        encode_lanes(st, cdf, syms)
    native_lists = st.to_ref_lists()

    # golden scalar path
    golden_lists = []
    for l in range(lanes):
        rs = RefState.from_reference_list(init[l])
        coder = RefANS(pmf[l], cdf[l].astype(np.uint64))
        for _ in range(3):
            coder.encode(rs, syms[l])
        golden_lists.append(rs.to_reference_list())

    assert native_lists == golden_lists

    # decode back: native
    for _ in range(3):
        out = decode_lanes(st, cdf)
        np.testing.assert_array_equal(out, syms)
    assert st.to_ref_lists() == init


def test_native_matches_lane_coder():
    """C++ host coder and the jnp TPU lane coder produce identical streams."""
    from bitswap_tpu.ans.vectorized import (
        ans_decode_lanes,
        ans_encode_lanes,
        init_lane_state,
        lane_state_to_ref_lists,
    )

    rng = np.random.default_rng(1)
    lanes, seq, support = 4, 32, 64
    _, cdf = _random_tables(rng, lanes, seq, support)
    syms = rng.integers(0, support, size=(lanes, seq)).astype(np.int32)

    lane = init_lane_state(lanes, capacity=2048, init_words=64)
    lane = ans_encode_lanes(lane, cdf, syms)
    jnp_lists = lane_state_to_ref_lists(lane)

    host = HostLanes.from_ref_lists(
        lane_state_to_ref_lists(init_lane_state(lanes, capacity=2048, init_words=64)),
        capacity=2048,
    )
    encode_lanes(host, cdf, syms)
    assert host.to_ref_lists() == jnp_lists

    out = decode_lanes(host, cdf)
    np.testing.assert_array_equal(out, syms)


def test_native_overflow_raises():
    rng = np.random.default_rng(2)
    _, cdf = _random_tables(rng, 1, 16, 8)
    syms = rng.integers(0, 8, size=(1, 16)).astype(np.int32)
    st = HostLanes.from_ref_lists([fresh_state(seed=7, nwords=4).to_reference_list()],
                                  capacity=4)
    with pytest.raises(OverflowError):
        for _ in range(200):
            encode_lanes(st, cdf, syms)
