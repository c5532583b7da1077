"""rANS coder tests: golden-reference invariants, exact quantization
semantics, and bit-for-bit equivalence of the lane-parallel JAX coder with
the scalar big-int reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from bitswap_tpu.ans.tables import (
    PRECISION_BITS,
    TOTAL_MASS,
    quantize_pmfs,
    build_tables_from_cdf,
)
from bitswap_tpu.ans.reference import RefANS, RefState, fresh_state
from bitswap_tpu.ans.vectorized import (
    init_lane_state,
    ans_encode_lanes,
    ans_decode_lanes,
    lane_state_to_ref_lists,
    lane_state_from_ref_lists,
)


def _torch_semantics_quantize(pmfs: np.ndarray, quantbits: int):
    """Independent big-int model of the reference quantization
    (mnist_compress.py:29-40), kept deliberately separate from the library
    implementation under test."""
    multiplier = (1 << PRECISION_BITS) - (1 << quantbits)
    p = (pmfs.astype(np.float64) * multiplier).astype(np.int64)  # trunc
    p += 1
    rows = np.arange(p.shape[0])
    p[rows, np.argmax(p, axis=1)] += (1 << PRECISION_BITS) - p.sum(1)
    cdf = np.concatenate([np.zeros((p.shape[0], 1), np.int64), np.cumsum(p, axis=1)], axis=1)
    return p, cdf


def _random_pmfs(rng, seq_len, support):
    """Dirichlet-ish random pmf rows with occasional near-zero bins."""
    raw = rng.gamma(0.3, 1.0, size=(seq_len, support))
    raw[rng.random(raw.shape) < 0.05] = 1e-12  # force +1-floor bins
    return raw / raw.sum(axis=1, keepdims=True)


class TestQuantization:
    def test_matches_torch_semantics(self):
        rng = np.random.default_rng(0)
        for quantbits, support in [(8, 256), (10, 1024), (6, 64)]:
            pmfs = _random_pmfs(rng, 37, support)
            want_pmf, want_cdf = _torch_semantics_quantize(pmfs, quantbits)
            got = quantize_pmfs(jnp.asarray(pmfs, jnp.float64), quantbits)
            np.testing.assert_array_equal(np.asarray(got.pmf, np.int64), want_pmf)
            np.testing.assert_array_equal(np.asarray(got.cdf, np.int64), want_cdf)

    def test_mass_exact(self):
        rng = np.random.default_rng(1)
        pmfs = _random_pmfs(rng, 64, 1024)
        t = quantize_pmfs(jnp.asarray(pmfs, jnp.float64), 10)
        assert np.all(np.asarray(t.pmf).sum(-1) == TOTAL_MASS)
        assert np.all(np.asarray(t.cdf)[..., -1] == TOTAL_MASS)
        assert np.all(np.asarray(t.pmf) >= 1)

    def test_build_from_cdf_matches_manual_concat(self):
        # the codec's pmf construction: diff of endpoint CDFs + tail bins
        rng = np.random.default_rng(2)
        seq, support = 16, 256
        ecdf = np.sort(rng.random((seq, support - 1)), axis=1)
        manual = np.concatenate(
            [ecdf[:, :1], ecdf[:, 1:] - ecdf[:, :-1], 1.0 - ecdf[:, -1:]], axis=1
        )
        want = quantize_pmfs(jnp.asarray(manual, jnp.float64), 8)
        got = build_tables_from_cdf(jnp.asarray(ecdf, jnp.float64), 8)
        np.testing.assert_array_equal(np.asarray(want.cdf), np.asarray(got.cdf))

    def test_float32_mode_no_wraparound(self):
        # f32 tables (the TPU fast path) must stay valid even when rounding
        # makes rows overshoot: total mass still exactly 2**31
        rng = np.random.default_rng(3)
        pmfs = _random_pmfs(rng, 32, 1024).astype(np.float32)
        t = quantize_pmfs(jnp.asarray(pmfs, jnp.float32), 10)
        assert np.all(np.asarray(t.pmf, np.int64).sum(-1) == TOTAL_MASS)
        assert np.all(np.asarray(t.pmf, np.int64) >= 1)


def _make_coder(rng, seq_len, support, quantbits):
    pmfs = _random_pmfs(rng, seq_len, support)
    t = quantize_pmfs(jnp.asarray(pmfs, jnp.float64), quantbits)
    return RefANS(np.asarray(t.pmf), np.asarray(t.cdf)), t


class TestRefANS:
    def test_roundtrip_restores_state_exactly(self):
        rng = np.random.default_rng(10)
        coder, _ = _make_coder(rng, 100, 256, 8)
        state = fresh_state(seed=100, nwords=50)
        initial = state.copy()
        syms = rng.integers(0, 256, size=100)
        state = coder.encode(state, syms)
        got = coder.decode(state)
        np.testing.assert_array_equal(got, syms)
        assert state.words == initial.words and state.head == initial.head

    def test_decode_then_encode_is_identity(self):
        # the bits-back direction: decoding consumes bits, re-encoding the
        # same symbols restores them (Bit-Swap's central invariant,
        # mnist_compress.py:358)
        rng = np.random.default_rng(11)
        coder, _ = _make_coder(rng, 200, 1024, 10)
        state = fresh_state(seed=7, nwords=200)
        initial = state.copy()
        syms = coder.decode(state)
        state = coder.encode(state, syms)
        assert state.words == initial.words and state.head == initial.head

    def test_head_stays_normalized(self):
        rng = np.random.default_rng(12)
        coder, _ = _make_coder(rng, 500, 64, 6)
        state = fresh_state(seed=3, nwords=100)
        syms = rng.integers(0, 64, size=500)
        state = coder.encode(state, syms)
        assert (1 << 32) <= state.head < (1 << 64)

    def test_compression_rate_near_entropy(self):
        # skewed distribution: coded size per symbol ~ entropy
        rng = np.random.default_rng(13)
        seq = 4000
        probs = np.array([0.9, 0.05, 0.03, 0.02])
        pmfs = np.tile(probs, (seq, 1))
        t = quantize_pmfs(jnp.asarray(pmfs, jnp.float64), 2)
        coder = RefANS(np.asarray(t.pmf), np.asarray(t.cdf))
        syms = rng.choice(4, p=probs, size=seq)
        state = fresh_state(seed=1, nwords=100)
        bits_before = state.total_bits()
        state = coder.encode(state, syms)
        rate = (state.total_bits() - bits_before) / seq
        entropy = -(probs * np.log2(probs)).sum()
        assert rate == pytest.approx(entropy, rel=0.12)


class TestVectorizedVsReference:
    @pytest.mark.parametrize(
        "seq_len,support,quantbits", [(64, 256, 8), (128, 1024, 10), (257, 64, 6)]
    )
    def test_encode_bitexact(self, seq_len, support, quantbits):
        rng = np.random.default_rng(20)
        num_lanes = 5
        tables, ref_coders, syms = [], [], []
        for _ in range(num_lanes):
            coder, t = _make_coder(rng, seq_len, support, quantbits)
            ref_coders.append(coder)
            tables.append(np.asarray(t.cdf, np.uint32))
            syms.append(rng.integers(0, support, size=seq_len))
        cdf = jnp.asarray(np.stack(tables))
        symbols = jnp.asarray(np.stack(syms), jnp.int32)

        lane = init_lane_state(num_lanes, capacity=seq_len + 300, init_words=200)
        ref_states = [
            RefState.from_reference_list(s) for s in lane_state_to_ref_lists(lane)
        ]
        lane = ans_encode_lanes(lane, cdf, symbols)
        assert not np.any(np.asarray(lane.overflow))
        got = lane_state_to_ref_lists(lane)
        for i in range(num_lanes):
            want = ref_coders[i].encode(ref_states[i], syms[i]).to_reference_list()
            assert got[i] == want, f"lane {i} stream mismatch"

    @pytest.mark.parametrize(
        "seq_len,support,quantbits", [(64, 256, 8), (128, 1024, 10), (600, 256, 8)]
    )
    def test_decode_bitexact(self, seq_len, support, quantbits):
        rng = np.random.default_rng(21)
        num_lanes = 4
        tables, ref_coders = [], []
        for _ in range(num_lanes):
            coder, t = _make_coder(rng, seq_len, support, quantbits)
            ref_coders.append(coder)
            tables.append(np.asarray(t.cdf, np.uint32))
        cdf = jnp.asarray(np.stack(tables))

        lane = init_lane_state(num_lanes, capacity=seq_len + 300, init_words=250)
        ref_states = [
            RefState.from_reference_list(s) for s in lane_state_to_ref_lists(lane)
        ]
        lane, symbols = ans_decode_lanes(lane, cdf)
        assert not np.any(np.asarray(lane.underflow))
        got = lane_state_to_ref_lists(lane)
        for i in range(num_lanes):
            want_syms = ref_coders[i].decode(ref_states[i])
            np.testing.assert_array_equal(np.asarray(symbols)[i], want_syms)
            assert got[i] == ref_states[i].to_reference_list()

    def test_decode_chunk_seams_bitexact(self, monkeypatch):
        # The chunked-window decode driver splits each op into sub-ops of
        # _decode_sym_chunk symbols (scaled down at high lane counts for
        # VMEM).  Force a small chunk so seq=600 decodes as three sub-ops
        # (88 + 256 + 256, consumed last-to-first): the chunk seams must be
        # invisible — symbols and final state bit-identical to the scalar
        # reference, exactly as in the unchunked run above.
        from bitswap_tpu.ans import vectorized as V

        monkeypatch.setattr(V, "_DECODE_SYM_CHUNK", 256)
        assert V._decode_sym_chunk(4) == 256
        rng = np.random.default_rng(23)
        seq_len, support, quantbits = 600, 256, 8
        num_lanes = 4
        tables, ref_coders = [], []
        for _ in range(num_lanes):
            coder, t = _make_coder(rng, seq_len, support, quantbits)
            ref_coders.append(coder)
            tables.append(np.asarray(t.cdf, np.uint32))
        cdf = jnp.asarray(np.stack(tables))

        lane = init_lane_state(num_lanes, capacity=seq_len + 300, init_words=250)
        ref_states = [
            RefState.from_reference_list(s) for s in lane_state_to_ref_lists(lane)
        ]
        lane, symbols = ans_decode_lanes(lane, cdf)
        assert not np.any(np.asarray(lane.underflow))
        got = lane_state_to_ref_lists(lane)
        for i in range(num_lanes):
            want_syms = ref_coders[i].decode(ref_states[i])
            np.testing.assert_array_equal(np.asarray(symbols)[i], want_syms)
            assert got[i] == ref_states[i].to_reference_list()

    def test_roundtrip_multi_op_interleaved(self):
        # Bit-Swap-shaped sequence: decode/encode interleave across several
        # different tables, then undo everything; state must return to the
        # exact initial bits.
        rng = np.random.default_rng(22)
        num_lanes, seq_len = 3, 96
        coders = []
        for qb, support in [(8, 256), (10, 1024), (6, 64)]:
            rows = []
            for _ in range(num_lanes):
                _, t = _make_coder(rng, seq_len, support, qb)
                rows.append(np.asarray(t.cdf, np.uint32))
            coders.append(jnp.asarray(np.stack(rows)))

        lane0 = init_lane_state(num_lanes, capacity=2048, init_words=500)
        initial = lane_state_to_ref_lists(lane0)

        lane = lane0
        decoded = []
        for cdf in coders:
            lane, s = ans_decode_lanes(lane, cdf)
            decoded.append(s)
        for cdf, s in zip(reversed(coders), reversed(decoded)):
            lane = ans_encode_lanes(lane, cdf, s)
        final = lane_state_to_ref_lists(lane)
        assert final == initial

    def test_state_list_serialization_roundtrip(self):
        lane = init_lane_state(4, capacity=64, init_words=32)
        lists = lane_state_to_ref_lists(lane)
        back = lane_state_from_ref_lists(lists, capacity=64)
        assert lane_state_to_ref_lists(back) == lists

    def test_extreme_skew_forces_renorm_and_min_freq(self):
        # one dominant bin + floor-frequency bins stresses both renorm paths
        rng = np.random.default_rng(23)
        seq, support = 300, 16
        pmfs = np.full((seq, support), 1e-13)
        pmfs[:, 3] = 1.0
        t = quantize_pmfs(jnp.asarray(pmfs / pmfs.sum(1, keepdims=True), jnp.float64), 4)
        ref = RefANS(np.asarray(t.pmf), np.asarray(t.cdf))
        cdf = jnp.asarray(np.asarray(t.cdf, np.uint32)[None])
        # encode the *rare* symbols: each costs ~31 bits, forcing renorms
        syms = rng.integers(0, support, size=seq)
        lane = init_lane_state(1, capacity=4096, init_words=64)
        ref_state = RefState.from_reference_list(lane_state_to_ref_lists(lane)[0])
        lane = ans_encode_lanes(lane, cdf, jnp.asarray(syms[None], jnp.int32))
        want = ref.encode(ref_state, syms).to_reference_list()
        assert lane_state_to_ref_lists(lane)[0] == want
        # and decode back
        lane2, got = ans_decode_lanes(lane, cdf)
        np.testing.assert_array_equal(np.asarray(got)[0], syms)
