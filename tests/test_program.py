"""Unit tests for the single-program codec's descriptor machinery
(codec/program.py) and the windowed buffer-op primitives the program leans
on (ans/vectorized.py).  End-to-end behavior is covered by test_codec /
test_experiment / the mesh dryruns; these pin the structural invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from bitswap_tpu.ans.vectorized import (
    _SPREAD_CAP,
    _lane_shift_right,
    init_lane_state,
    pad_lane_state,
)
from bitswap_tpu.codec.program import build_op_stream


@pytest.mark.parametrize("bitswap", [True, False])
@pytest.mark.parametrize("nz", [1, 2, 4, 8])
def test_op_stream_structure(bitswap, nz):
    """Sender and receiver streams have equal length (they must share one
    compiled program), reference op order, and mirrored structure."""
    T = 3
    INFER, GEN = lambda z: z, lambda z: nz + z
    PRIOR, LOADX, STOREX = 2 * nz, 2 * nz + 1, 2 * nz + 2

    enc_code, enc_dp, enc_is = build_op_stream(nz, bitswap, "encode", T)
    dec_code, dec_dp, dec_is = build_op_stream(nz, bitswap, "decode", T)
    n = T * (2 * nz + 2)
    assert enc_code.shape == dec_code.shape == (n,)

    per = 2 * nz + 2
    for t in range(T):
        ops = list(zip(enc_code[t * per:(t + 1) * per],
                       enc_is[t * per:(t + 1) * per]))
        assert ops[0] == (LOADX, False)
        assert ops[-1] == (PRIOR, True)
        if bitswap:  # interleaved dec/enc (mnist_compress.py:179-205)
            expect = []
            for zi in range(nz):
                expect += [(INFER(zi), False), (GEN(zi), True)]
        else:  # all decodes then all encodes (:209-243)
            expect = [(INFER(zi), False) for zi in range(nz)]
            expect += [(GEN(zi), True) for zi in range(nz)]
        assert ops[1:-1] == expect
        assert set(enc_dp[t * per:(t + 1) * per]) == {t}

    # receiver pops datapoints LIFO, opens each with PRIOR dec, closes with
    # STOREX, and mirrors every model op with the OPPOSITE coder direction
    assert list(dec_dp[:per]) == [T - 1] * per
    for k in range(T):
        ops = list(zip(dec_code[k * per:(k + 1) * per],
                       dec_is[k * per:(k + 1) * per]))
        assert ops[0] == (PRIOR, False)
        assert ops[-1] == (STOREX, False)
        if bitswap:  # mnist_compress.py:296-317
            expect = []
            for zi in reversed(range(nz)):
                expect += [(GEN(zi), False), (INFER(zi), True)]
        else:  # :322-352
            expect = [(GEN(zi), False) for zi in reversed(range(nz))]
            expect += [(INFER(zi), True) for zi in reversed(range(nz))]
        assert ops[1:-1] == expect
    # sender's and receiver's model-op multisets per datapoint agree, with
    # flipped directions (same branch instance serves both sides)
    s_model = sorted((c, e) for c, e in zip(enc_code[:per], enc_is[:per]) if c < PRIOR)
    r_model = sorted((c, not e) for c, e in zip(dec_code[:per], dec_is[:per]) if c < PRIOR)
    assert s_model == r_model


def test_lane_shift_right_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2 ** 31, (7, 96)).astype(np.uint32)
    d = rng.integers(0, 96, (7,)).astype(np.int32)
    out = np.asarray(_lane_shift_right(jnp.asarray(x), jnp.asarray(d), np.uint32(0)))
    for l in range(7):
        expect = np.concatenate([np.zeros(d[l], np.uint32), x[l, : 96 - d[l]]])
        np.testing.assert_array_equal(out[l], expect)


def test_pad_lane_state_depth_and_content():
    """Padding lanes sit at the REAL lanes' minimum depth with random
    (non-zero) stack words — a zero stack decodes pathologically (every
    popped 0-word forces another pop) and blows the _SPREAD_CAP window."""
    st = init_lane_state(3, capacity=4096, init_words=512)
    st = st._replace(sp=jnp.asarray(np.array([700, 650, 720], np.int32)))
    padded = pad_lane_state(st, 5)
    sp = np.asarray(padded.sp)
    assert list(sp[3:]) == [650, 650]
    pad_words = np.asarray(padded.buf)[3:, :650]
    assert (pad_words >= (1 << 16)).all()  # real random init words, no zeros
    assert int(np.asarray(padded.hi)[3]) >= (1 << 16)
    # spread stays within the windowed buffer ops' supported cap
    assert sp.max() - sp.min() <= _SPREAD_CAP
