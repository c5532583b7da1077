"""On-device Pallas/jnp bit-parity check — run this ON THE REAL TPU.

tests/test_pallas.py exercises the same kernels in interpret mode on CPU,
which says nothing about Mosaic *lowering* (round 1 shipped kernels that
passed CPU tests and crashed on hardware: unsigned-int reductions).  This
script compiles every kernel variant on the default backend and asserts the
streams are bit-identical to the portable jnp scan path:

  1. encode_window_pallas  vs encode_window_jnp   (per-lane tables)
  2. decode_window_pallas  vs decode_window_jnp
  3. decode_window_shared_pallas vs decode_window_shared_jnp (top prior)
  4. a full multi-op LaneState encode->decode round trip with
     BITSWAP_TPU_CODER=pallas, asserting symbol recovery and the bits-back
     state restoration (reference invariant, mnist_compress.py:319,358)

Shapes cover lanes both below / at / above the 128 VPU width and seq sizes
that exercise the chunked grid (including non-divisor-friendly seq).

Exit code 0 iff everything matches.  Usage: python scripts/tpu_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BITSWAP_TPU_CODER", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans import pallas_coder as pc
from bitswap_tpu.ans.tables import TOTAL_MASS, quantize_pmfs
from bitswap_tpu.ans.vectorized import (
    ans_decode_lanes_ll,
    ans_decode_lanes_shared,
    ans_encode_lanes_ll,
    ans_encode_lanes_shared,
    init_lane_state,
    lane_state_to_ref_lists,
)


def _random_tables(rng, seq, S, L):
    """Random valid integer tables, lanes-last (seq, S, L) minus final row."""
    pmf = rng.gamma(0.5, size=(L, seq, S)).astype(np.float64) + 1e-9
    pmf /= pmf.sum(-1, keepdims=True)
    quantbits = int(np.ceil(np.log2(S)))
    tables = quantize_pmfs(jnp.asarray(pmf), quantbits)
    # (L, seq, S+1) -> lanes-last (seq, S, L), implicit final entry dropped
    return jnp.transpose(tables.cdf[..., :-1], (1, 2, 0)).astype(jnp.uint32)


def _fresh_heads(rng, L):
    hi = rng.integers(1 << 16, (1 << 32) - 1, size=L, dtype=np.uint64).astype(np.uint32)
    lo = np.zeros(L, np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo)


def check_window_parity(seq, S, L, seed):
    rng = np.random.default_rng(seed)
    cdf = _random_tables(rng, seq, S, L)
    hi, lo = _fresh_heads(rng, L)
    syms = jnp.asarray(rng.integers(0, S, size=(seq, L)), jnp.int32)

    # per-position (p, c) from the table
    c_lo = jnp.take_along_axis(cdf, syms[:, None, :], axis=1)[:, 0]
    hi_idx = jnp.minimum(syms + 1, S - 1)[:, None, :]
    c_hi = jnp.take_along_axis(cdf, hi_idx, axis=1)[:, 0]
    c_hi = jnp.where(syms == S - 1, jnp.uint32(TOTAL_MASS), c_hi)
    p, c = c_hi - c_lo, c_lo

    e_j = jax.jit(pc.encode_window_jnp)(hi, lo, p, c)
    e_p = jax.jit(pc.encode_window_pallas)(hi, lo, p, c)
    for a, b, name in zip(e_j, e_p, ("hi", "lo", "words", "mask")):
        a, b = np.asarray(a), np.asarray(b)
        if name == "words":  # words only meaningful where mask is set
            m = np.asarray(e_j[3])
            a, b = a[m], b[np.asarray(e_p[3])]
        np.testing.assert_array_equal(a, b, err_msg=f"encode {name} seq={seq} S={S} L={L}")

    # decode parity: decode what we just encoded (window = pushed words in
    # pop order per lane, padded) — exercised via the LaneState ops below;
    # here feed both paths an identical synthetic window
    W = seq + 2
    window = jnp.asarray(
        rng.integers(1 << 16, (1 << 32) - 1, size=(W, L), dtype=np.uint64).astype(np.uint32)
    )
    hi2, lo2 = e_p[0], e_p[1]
    d_j = jax.jit(pc.decode_window_jnp)(hi2, lo2, jnp.transpose(cdf, (0, 1, 2)), window)
    d_p = jax.jit(pc.decode_window_pallas)(hi2, lo2, cdf, window)
    for a, b, name in zip(d_j, d_p, ("hi", "lo", "syms", "npop")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"decode {name} seq={seq} S={S} L={L}"
        )

    # shared-table decode parity
    cdf_shared = cdf[:, :, 0]
    s_j = jax.jit(pc.decode_window_shared_jnp)(hi2, lo2, cdf_shared, window)
    s_p = jax.jit(pc.decode_window_shared_pallas)(hi2, lo2, cdf_shared, window)
    for a, b, name in zip(s_j, s_p, ("hi", "lo", "syms", "npop")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"shared decode {name} seq={seq} S={S} L={L}"
        )
    print(f"  window parity ok: seq={seq} S={S} L={L}")


def check_roundtrip(seq, S, L, nops, seed):
    """Full LaneState multi-op round trip entirely through the active
    (Pallas on TPU) dispatch path."""
    rng = np.random.default_rng(seed)
    state0 = init_lane_state(L, capacity=8192, seed=seed, init_words=256)
    state = state0
    all_syms = []
    tables = []
    for _ in range(nops):
        cdf = _random_tables(rng, seq, S, L)
        syms = jnp.asarray(rng.integers(0, S, size=(L, seq)), jnp.int32)
        state, syms_dec = ans_decode_lanes_ll(state, cdf)  # bits-back decode
        state = ans_encode_lanes_ll(state, cdf, syms_dec)  # give them back
        state = ans_encode_lanes_ll(state, cdf, syms)
        tables.append(cdf)
        all_syms.append(syms)
    shared = _random_tables(rng, seq, S, 1)[:, :, 0]
    top = jnp.asarray(rng.integers(0, S, size=(L, seq)), jnp.int32)
    state = ans_encode_lanes_shared(state, shared, top)

    state, top_dec = ans_decode_lanes_shared(state, shared)
    np.testing.assert_array_equal(np.asarray(top_dec), np.asarray(top))
    for cdf, syms in zip(reversed(tables), reversed(all_syms)):
        state, dec = ans_decode_lanes_ll(state, cdf)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(syms))
        state, back = ans_decode_lanes_ll(state, cdf)
        state = ans_encode_lanes_ll(state, cdf, back)
    assert not np.any(np.asarray(state.underflow)), "underflow"
    assert not np.any(np.asarray(state.overflow)), "overflow"
    assert lane_state_to_ref_lists(state) == lane_state_to_ref_lists(state0), (
        "bits-back state not restored"
    )
    print(f"  roundtrip ok: seq={seq} S={S} L={L} nops={nops}")


def main():
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind}); "
          f"pallas={'ON' if pc.use_pallas() else 'OFF'} "
          f"interpret={pc._interpret()}")
    if not pc.use_pallas():
        print("WARNING: Pallas dispatch inactive — set BITSWAP_TPU_CODER=pallas")

    # lanes below/at/above 128; seq prime and composite; small & real supports
    check_window_parity(seq=64, S=16, L=7, seed=0)
    check_window_parity(seq=37, S=64, L=128, seed=1)
    check_window_parity(seq=256, S=1024, L=96, seed=2)
    check_window_parity(seq=100, S=256, L=192, seed=3)

    check_roundtrip(seq=64, S=256, L=24, nops=3, seed=10)
    check_roundtrip(seq=256, S=1024, L=136, nops=2, seed=11)
    print("ALL PARITY CHECKS PASSED on", dev.platform)


if __name__ == "__main__":
    sys.exit(main())
