"""Pallas coder kernels: bit-exact parity with the portable jnp window ops.

On CPU the kernels run in Pallas interpreter mode (same program, no Mosaic),
so these tests validate kernel logic everywhere; scripts/tpu_parity.py runs
the same checks compiled on the real chip.
"""

import numpy as np
import jax.numpy as jnp

from bitswap_tpu.ans import pallas_coder as pc
from bitswap_tpu.ans.tables import TOTAL_MASS, build_tables_ll


def _random_tables_ll(rng, seq, S, L, quantbits):
    ecdf = np.sort(rng.random((seq, S - 1, L)), axis=1)
    return build_tables_ll(jnp.asarray(ecdf, jnp.float64), quantbits)


def _heads(rng, L):
    hi = rng.integers(1, 1 << 31, size=L, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=L, dtype=np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


class TestEncodeWindowParity:
    def test_matches_jnp(self):
        rng = np.random.default_rng(0)
        seq, S, L = 96, 64, 130  # L exercises lane padding; seq chunking
        cdf = _random_tables_ll(rng, seq, S, L, quantbits=6)
        syms = rng.integers(0, S, size=(seq, L)).astype(np.int32)
        c_lo = np.take_along_axis(np.asarray(cdf), syms[:, None, :], axis=1)[:, 0]
        up = np.minimum(syms + 1, S - 1)
        c_hi = np.take_along_axis(np.asarray(cdf), up[:, None, :], axis=1)[:, 0]
        c_hi = np.where(syms == S - 1, np.uint32(TOTAL_MASS), c_hi)
        p = jnp.asarray(c_hi - c_lo)
        c = jnp.asarray(c_lo)
        hi, lo = _heads(rng, L)

        ref = pc.encode_window_jnp(hi, lo, p, c)
        got = pc.encode_window_pallas(hi, lo, p, c)
        for r, g, name in zip(ref, got, ["hi", "lo", "words", "mask"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


class TestDecodeWindowParity:
    def test_matches_jnp(self):
        rng = np.random.default_rng(1)
        seq, S, L = 96, 64, 130
        cdf = _random_tables_ll(rng, seq, S, L, quantbits=6)
        hi, lo = _heads(rng, L)
        window = jnp.asarray(
            rng.integers(1 << 16, 1 << 32, size=(seq, L), dtype=np.uint32))

        ref = pc.decode_window_jnp(hi, lo, cdf, window)
        got = pc.decode_window_pallas(hi, lo, cdf, window)
        for r, g, name in zip(ref, got, ["hi", "lo", "syms", "npop"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)

    def test_shared_matches_jnp(self):
        rng = np.random.default_rng(2)
        seq, S, L = 64, 32, 128
        cdf = _random_tables_ll(rng, seq, S, 1, quantbits=5)[..., 0]
        hi, lo = _heads(rng, L)
        window = jnp.asarray(
            rng.integers(1 << 16, 1 << 32, size=(seq, L), dtype=np.uint32))

        ref = pc.decode_window_shared_jnp(hi, lo, cdf, window)
        got = pc.decode_window_shared_pallas(hi, lo, cdf, window)
        for r, g, name in zip(ref, got, ["hi", "lo", "syms", "npop"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)

    def test_lane_group_split_matches_unsplit(self, monkeypatch):
        # High lane counts split decode-kernel calls into lane groups
        # (the S*R*128 search temporaries blow the 16MB scoped-VMEM limit
        # from R=16 up — mnist_probe r5).  Force the split at a small L and
        # pin bit-parity with the unsplit kernel on both wrapper variants.
        rng = np.random.default_rng(3)
        seq, S, L = 48, 32, 300  # R=3 lane rows
        cdf = _random_tables_ll(rng, seq, S, L, quantbits=5)
        cdf1 = _random_tables_ll(rng, seq, S, 1, quantbits=5)[..., 0]
        hi, lo = _heads(rng, L)
        window = jnp.asarray(
            rng.integers(1 << 16, 1 << 32, size=(seq, L), dtype=np.uint32))

        ref_ll = pc.decode_window_pallas(hi, lo, cdf, window)
        ref_sh = pc.decode_window_shared_pallas(hi, lo, cdf1, window)
        monkeypatch.setattr(pc, "_decode_max_lane_rows", lambda S, W: 1)
        got_ll = pc.decode_window_pallas(hi, lo, cdf, window)
        got_sh = pc.decode_window_shared_pallas(hi, lo, cdf1, window)
        for ref, got in [(ref_ll, got_ll), (ref_sh, got_sh)]:
            for r, g, name in zip(ref, got, ["hi", "lo", "syms", "npop"]):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


class TestRoundTripThroughLaneOps:
    def test_encode_decode_roundtrip_pallas(self, monkeypatch):
        """Force the pallas path through the high-level lane ops and check
        encode -> decode recovers symbols and the initial state."""
        monkeypatch.setenv("BITSWAP_TPU_CODER", "pallas")
        pc.use_pallas.cache_clear()
        try:
            from bitswap_tpu.ans.vectorized import (
                ans_decode_lanes_ll,
                ans_encode_lanes_ll,
                init_lane_state,
                lane_state_to_ref_lists,
            )

            rng = np.random.default_rng(3)
            seq, S, L = 48, 16, 4
            cdf = _random_tables_ll(rng, seq, S, L, quantbits=4)
            syms = jnp.asarray(rng.integers(0, S, size=(L, seq)).astype(np.int32))
            st0 = init_lane_state(L, capacity=512, init_words=32)
            st = ans_encode_lanes_ll(st0, cdf, syms)
            assert not np.any(np.asarray(st.overflow))
            st, got = ans_decode_lanes_ll(st, cdf)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(syms))
            assert lane_state_to_ref_lists(st) == lane_state_to_ref_lists(st0)
        finally:
            pc.use_pallas.cache_clear()
