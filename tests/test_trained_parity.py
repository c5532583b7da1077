"""Trained-checkpoint parity boundary: what "reference parity" means here.

The executed byte-parity proof (tests/test_stream_parity.py) demonstrates
bins math, f64 CDF evaluation, quantization, state machine, and interleave
order are bit-identical to the reference's own coding loop, with recorded
(mu, scale) feeds — because torch-CPU and XLA f32 convolutions differ in
ulps, and 1-ulp mu/scale differences can flip integer table entries at
truncation boundaries.  These tests close the remaining question from
SURVEY §7 ("reproducing reference bytes") on OUR trained checkpoints:

1. the float64 tables mode (the reference's own compression dtype,
   mnist_compress.py:77) round-trips end-to-end with a real trained
   checkpoint — the mode an importer of reference checkpoints would run;
2. the f32-vs-f64 table divergence on trained weights is measured and
   bounded: ~10% of integer table entries shift, by at most a few hundred
   units of the 2**31 total mass (~2e-7 relative) — the inherent precision
   gap of evaluating the logistic CDF in f32, amplified by the 2**31
   quantization multiplier.  This changes STREAM BYTES but not
   correctness: each mode is self-consistent end-to-end (same shared
   executables both directions) and the rate impact is far below 0.01 b/d.
   Byte-identical output to the reference therefore requires the f64
   tables mode, which is exactly the reference's own compression dtype.

Together with test_stream_parity.py this documents the parity contract:
byte-identical streams to the reference require f64 tables + the
reference's conv arithmetic; the framework guarantees self-consistent
streams per (table_dtype, backend) and ELBO-tight rates in every mode.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.codec.bitswap import CodecConfig, _build_tab, make_codec
from bitswap_tpu.codec.discretize import discretize_bins
from bitswap_tpu.models import init_params
from bitswap_tpu.train.data import load_dataset
from bitswap_tpu.train.runtime import load_params
from bitswap_tpu.utils.registry import get_spec
from bitswap_tpu.ans.vectorized import arrays_equal, lane_states_equal

CKPT = os.path.join(os.path.dirname(__file__), "..", "params", "mnist", "nz4.msgpack")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="trained mnist checkpoint not present")


@pytest.fixture(scope="module")
def trained_setup():
    cfg = get_spec("mnist").model_config(4, dropout_p=0.0)
    test_data, _ = load_dataset("mnist", "test", cfg.xs)
    params = load_params(CKPT, init_params(jax.random.PRNGKey(0), cfg))
    bins = discretize_bins(
        params, cfg, 10, jax.random.PRNGKey(2), data=test_data[:256],
        cache_path=os.path.join(os.path.dirname(CKPT), "..", "..", "bins",
                                "bench_mnist_nz4_qb10.npz"),
    )
    return cfg, params, bins, test_data


def _roundtrip(cfg, params, bins, test_data, table_dtype):
    L, T = 4, 2
    xs = test_data[:T * L].reshape(T, L, cfg.xdim).astype(np.int32)
    ccfg = CodecConfig(model=cfg, quantbits=10, bitswap=True,
                       table_dtype=table_dtype, init_words=1024, capacity=8192)
    codec = make_codec(params, ccfg, bins)
    st0 = codec.init_state(L)
    st = codec.encode_datapoints(st0, jnp.asarray(xs))
    st2, dec = codec.decode_datapoints(st, T)
    assert bool(arrays_equal(dec, jnp.asarray(xs))), f"{table_dtype} round-trip"
    assert bool(np.all(np.asarray(lane_states_equal(st2, st0)))), \
        f"{table_dtype} bits-back"
    words = np.asarray(st.sp) - np.asarray(st0.sp)
    return float(words.mean() * 32.0 / (T * cfg.xdim))


def test_f64_tables_roundtrip_trained(trained_setup):
    """The reference-dtype mode works end-to-end on a trained checkpoint."""
    cfg, params, bins, test_data = trained_setup
    bpd64 = _roundtrip(cfg, params, bins, test_data, "float64")
    assert 3.0 < bpd64 < 7.0, bpd64  # sane trained-model rate


def test_f32_f64_rate_gap_small(trained_setup):
    """f32 (fused, TPU-native) and f64 (reference-dtype) modes are both
    self-consistent; their RATES agree to well under 0.01 b/d."""
    cfg, params, bins, test_data = trained_setup
    bpd32 = _roundtrip(cfg, params, bins, test_data, "float32")
    bpd64 = _roundtrip(cfg, params, bins, test_data, "float64")
    assert abs(bpd32 - bpd64) < 0.01, (bpd32, bpd64)


def test_table_divergence_bounded(trained_setup):
    """Integer tables built from the same trained (mu, scale) in f32 vs f64
    shift a bounded fraction of entries by a bounded (tiny relative) amount
    — the quantitative boundary of byte parity.  Measured on the committed
    checkpoint: ~10% of pmf entries shift, max shift ~354 of 2**31
    (1.6e-7 relative mass, i.e. < 1e-5 b/d of rate)."""
    cfg, params, bins, test_data = trained_setup
    x = jnp.asarray(test_data[:4].reshape(4, cfg.xdim).astype(np.int32))
    ccfg = CodecConfig(model=cfg, quantbits=10, table_dtype="float64")
    codec = make_codec(params, ccfg, bins)
    mu, sc = codec._mu_scale("infer", 0, x)
    e64 = codec._zend_rows[0]  # float64 endpoints
    tab64 = np.asarray(_build_tab(mu, sc, e64, 10)).astype(np.int64)
    tab32 = np.asarray(_build_tab(mu, sc, e64.astype(jnp.float32), 10)).astype(np.int64)
    full64 = np.concatenate([tab64, np.full_like(tab64[:, :1], 1 << 31)], axis=1)
    full32 = np.concatenate([tab32, np.full_like(tab32[:, :1], 1 << 31)], axis=1)
    pmf_diff = np.diff(full64, axis=1) - np.diff(full32, axis=1)
    frac = float((pmf_diff != 0).mean())
    rel = float(np.abs(pmf_diff).max()) / (1 << 31)
    assert frac < 0.25, frac          # bounded fraction of entries shift
    assert rel < 1e-5, rel            # by a tiny relative mass
