"""Fused (table-free) affine-CDF coder: validity, parity, and round trips.

The fused mode (ans/fused.py) replaces the materialized integer tables of the
reference quantization (mnist_compress.py:29-36) with pointwise CDF
evaluation inside the kernels — encode needs 2 sigmoids/symbol, decode a
log2(S)-step binary search.  It must still be a *valid* rANS table family
(monotone, mass exactly 2**31, every pmf >= 1) and self-consistent between
encoder and decoder; these tests check those invariants, jnp vs
Pallas-interpret parity, and the end-to-end codec round trip + bits-back
invariant in fused mode (the framework-native float32 default).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.ans import fused as fz
from bitswap_tpu.ans.tables import TOTAL_MASS


def _affine_coeffs(rng, seq, L, S, kind):
    """Random but realistic sigmoid-argument coefficients: mu within the bin
    span, scale spanning peaked to broad distributions."""
    if kind == "logit":
        mu = rng.normal(0, 2, (seq, L))
        scale = rng.uniform(0.3, 3.0, (seq, L))
        A = -mu / scale
        B = 1.0 / scale
    else:
        e0 = rng.normal(0, 1, (seq, L))
        w = rng.uniform(0.01, 0.2, (seq, L))
        mu = e0 + w * rng.uniform(0, S, (seq, L))
        scale = rng.uniform(0.05, 4.0, (seq, L)) * w * S / 8
        A = (e0 - w - mu) / scale
        B = w / scale
    return jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32)


def _heads(rng, L):
    hi = rng.integers(1, 1 << 31, size=L, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=L, dtype=np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


class TestCdfEval:
    @pytest.mark.parametrize("kind", ["linear", "logit"])
    def test_valid_table_family(self, kind):
        """cdf(0)=0, cdf(S)=2**31, strictly monotone => pmf >= 1 per symbol."""
        rng = np.random.default_rng(0)
        S = 64
        A, B = _affine_coeffs(rng, 8, 16, S, kind)
        v = jnp.arange(S + 1, dtype=jnp.int32)[:, None, None]
        cdf = np.asarray(fz._cdf_eval(A[None], B[None], v, S, kind)).astype(np.uint64)
        assert np.all(cdf[0] == 0)
        assert np.all(cdf[-1] == TOTAL_MASS)
        assert np.all(np.diff(cdf, axis=0) >= 1)  # pmf(s) >= 1 for all s
        assert np.all(cdf[:-1] < (1 << 31))

    @pytest.mark.parametrize("kind", ["linear", "logit"])
    def test_search_inverts_eval(self, kind):
        """binary search returns exactly the s with cdf(s) <= m < cdf(s+1)."""
        rng = np.random.default_rng(1)
        S = 64
        A, B = _affine_coeffs(rng, 4, 8, S, kind)
        v = jnp.arange(S + 1, dtype=jnp.int32)[:, None, None]
        cdf = np.asarray(fz._cdf_eval(A[None], B[None], v, S, kind)).astype(np.uint64)
        m = jnp.asarray(rng.integers(0, 1 << 31, size=A.shape, dtype=np.uint32))
        s, c, p = fz._search(A, B, m, S, kind)
        s, c, p = np.asarray(s), np.asarray(c), np.asarray(p)
        want = (np.sum(cdf[:-1] <= np.asarray(m).astype(np.uint64)[None], axis=0) - 1)
        np.testing.assert_array_equal(s, want)
        got_c = np.take_along_axis(cdf, s[None], axis=0)[0]
        got_p = np.take_along_axis(cdf, s[None] + 1, axis=0)[0] - got_c
        np.testing.assert_array_equal(c.astype(np.uint64), got_c)
        np.testing.assert_array_equal(p.astype(np.uint64), got_p)


class TestWindowParity:
    @pytest.mark.parametrize("kind", ["linear", "logit"])
    def test_encode_matches_jnp(self, kind):
        rng = np.random.default_rng(2)
        seq, S, L = 96, 64, 130  # exercises lane padding + seq chunking
        A, B = _affine_coeffs(rng, seq, L, S, kind)
        syms = jnp.asarray(rng.integers(0, S, size=(seq, L)).astype(np.int32))
        hi, lo = _heads(rng, L)
        ref = fz.encode_window_affine_jnp(hi, lo, A, B, syms, S, kind)
        got = fz.encode_window_affine_pallas(hi, lo, A, B, syms, S, kind)
        for r, g, name in zip(ref, got, ["hi", "lo", "words", "mask"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)

    @pytest.mark.parametrize("kind", ["linear", "logit"])
    def test_decode_matches_jnp(self, kind):
        rng = np.random.default_rng(3)
        seq, S, L = 96, 64, 130
        A, B = _affine_coeffs(rng, seq, L, S, kind)
        hi, lo = _heads(rng, L)
        window = jnp.asarray(
            rng.integers(1 << 16, 1 << 32, size=(seq, L), dtype=np.uint32))
        ref = fz.decode_window_affine_jnp(hi, lo, A, B, window, S, kind)
        got = fz.decode_window_affine_pallas(hi, lo, A, B, window, S, kind)
        for r, g, name in zip(ref, got, ["hi", "lo", "syms", "npop"]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


class TestFusedCodecRoundTrip:
    @pytest.fixture(scope="class")
    def setup(self):
        from bitswap_tpu.models import VAEConfig, init_params, data_dependent_init
        from bitswap_tpu.codec.discretize import discretize_bins
        from tests.test_codec import _structured_images

        cfg = VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, nprocessing=1,
                        resdepth=2, reswidth=8)
        params = init_params(jax.random.PRNGKey(0), cfg)
        warm = _structured_images(32, cfg.xs, 0).astype(np.float32)
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), jnp.asarray(warm))
        data = _structured_images(64, cfg.xs, 1).astype(np.float32)
        bins = discretize_bins(params, cfg, quantbits=6, key=jax.random.PRNGKey(2),
                               data=data, batch_size=64)
        return cfg, params, bins

    @pytest.mark.parametrize("bitswap", [True, False], ids=["bitswap", "bbans"])
    def test_roundtrip_and_bits_back(self, setup, bitswap):
        from bitswap_tpu.codec.bitswap import CodecConfig, make_codec, net_words
        from bitswap_tpu.ans.vectorized import lane_state_to_ref_lists
        from tests.test_codec import _structured_images

        cfg, params, bins = setup
        ccfg = CodecConfig(model=cfg, quantbits=6, bitswap=bitswap,
                           table_dtype="float32", init_words=400, capacity=8192,
                           coder="fused")
        assert ccfg.use_fused
        codec = make_codec(params, ccfg, bins)
        L, T = 3, 4
        xs = _structured_images(T * L, cfg.xs, 7).reshape(T, L, cfg.xdim)
        state0 = codec.init_state(L)
        initial = lane_state_to_ref_lists(state0)
        state = codec.encode_datapoints(state0, jnp.asarray(xs))
        assert not np.any(np.asarray(state.overflow))
        assert np.all(net_words(state) - net_words(state0) > 0)
        state, decoded = codec.decode_datapoints(state, T)
        np.testing.assert_array_equal(np.asarray(decoded), xs)
        assert lane_state_to_ref_lists(state) == initial

    def test_fused_rate_close_to_tables(self, setup):
        """The fused quantization differs from the reference's, but on the
        same data/model its rate must land within a whisker of tables mode
        (the +v floor vs +1/bin floor both cost O(S/2**31) b/sym)."""
        from bitswap_tpu.codec.bitswap import CodecConfig, make_codec, net_words
        from tests.test_codec import _structured_images

        cfg, params, bins = setup
        L, T = 2, 6
        xs = _structured_images(T * L, cfg.xs, 13).reshape(T, L, cfg.xdim)
        rates = {}
        for coder in ("fused", "tables"):
            ccfg = CodecConfig(model=cfg, quantbits=6, bitswap=True,
                               table_dtype="float32", init_words=400,
                               capacity=16384, coder=coder)
            codec = make_codec(params, ccfg, bins)
            st0 = codec.init_state(L)
            st = codec.encode_datapoints(st0, jnp.asarray(xs))
            rates[coder] = float(np.mean(
                (net_words(st) - net_words(st0)) * 32.0 / (T * cfg.xdim)))
        assert abs(rates["fused"] - rates["tables"]) < 0.02, rates


def test_affine_chunk_cap_scales_with_lane_rows():
    # VMEM envelope rule (r5): chunk*R <= 512*8, with an extra halving from
    # R>=32.  R<=8 keeps the proven 512 chunk (existing compiled programs
    # unchanged); larger lane counts scale it down so the encode kernel's
    # block residency stays under the 16MB scoped-VMEM limit (L=2048
    # overflowed by 32KB at chunk=512; L=4096 overflowed by 80KB at
    # chunk*R=4096 because the fixed (R,128) lane blocks grow with R).
    from bitswap_tpu.ans.fused import _affine_chunk_cap

    assert _affine_chunk_cap(1) == 512
    assert _affine_chunk_cap(8) == 512
    assert _affine_chunk_cap(16) == 256
    assert _affine_chunk_cap(32) == 64
    assert _affine_chunk_cap(64) == 32
    assert _affine_chunk_cap(4096) == 32  # floor


def test_decode_sym_chunk_scales_with_lane_rows():
    # The decode kernels keep the whole (W=chunk, R, 128) word window
    # resident in VMEM, so the sub-op symbol chunk shrinks with lane rows:
    # W*R <= 16*1024 (8MB window).  L<=2048 keeps the tuned 1024 chunk; at
    # L=4096 a 1024-symbol window alone is the whole 16MB scoped budget
    # (measured OOM, mnist_probe r5).
    from bitswap_tpu.ans.vectorized import _decode_sym_chunk

    assert _decode_sym_chunk(100) == 1024
    assert _decode_sym_chunk(1024) == 1024
    assert _decode_sym_chunk(2048) == 1024
    assert _decode_sym_chunk(4096) == 512
    assert _decode_sym_chunk(8192) == 256
    assert _decode_sym_chunk(1 << 20) == 128  # floor
