"""Table-free rANS window ops: fused CDF evaluation + pointwise quantization.

The reference (and our `tables` mode) quantizes the PMF row-wise —
scale/trunc/+1/remainder-to-argmax (mnist_compress.py:29-36) — which forces
materializing a (seq, S, L) integer table in HBM per coder op; profiling on
v5e shows those table builds dominate the whole codec (~4ms per op at L=128
vs ~1ms for the coder kernel itself).  This module replaces them with a
TPU-native quantization that needs NO table at all:

    cdf_int(v) = trunc(F(v) * M) + v,   M = 2**31 - S,   v in [0, S]
    with F(0) := 0 and F(S) := 1, so cdf_int(0) = 0 and cdf_int(S) = 2**31.

Properties: strictly monotone (the +v term), total mass exactly 2**31,
pmf(s) = cdf(s+1) - cdf(s) >= 1 — a valid rANS table — and *pointwise
evaluable*: one sigmoid per query.  F comes from the model's Logistic CDF at
the bin endpoints; both bin families are arithmetic in the bin index v:

- empirical latent bins and pixel bins are equal-width (discretization.py's
  KBinsDiscretizer(strategy='uniform'); rand.py:134-153), so the sigmoid
  argument is affine:  arg(v) = A + B*v  (kind="linear");
- the top-layer prior bins are equal-mass under Logistic(0,1)
  (rand.py:78-128): endpoint(v) = icdf(v/S) = log(v) - log(S-v), so
  arg(v) = A + B*(log v - log(S-v))  (kind="logit").

Encode evaluates cdf_int at s and s+1 (2 sigmoids/symbol); decode finds the
symbol by BINARY SEARCH with on-the-fly evaluation — log2(S) sigmoids per
symbol instead of an O(S) masked scan over a materialized row.  Encoder and
decoder share one `_cdf_eval`, so streams are self-consistent by
construction.  This is the framework-native float32 mode; byte-level
reference parity still goes through the `tables` path.

Shapes mirror pallas_coder.py: per-position arrays are lanes-last
(seq, R, 128) inside kernels, (seq, L) at the jnp level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans.pallas_coder import (
    _MASK31,
    _U32,
    _b2u,
    _decode_transition,
    _encode_step,
    _interpret,
    _largest_chunk,
    _onehot_word,
    _pad_lanes,
    use_pallas,
)
from bitswap_tpu.ans.tables import TOTAL_MASS

_KINDS = ("linear", "logit")


def _nofma(x, pin: bool):
    """Pin an intermediate value so the compiler cannot contract the
    surrounding mul+add into an FMA.  The encoder and decoder evaluate
    `_cdf_eval` from two different compiled programs (the encode and decode
    kernels); bits-back exactness needs cdf_int(v) to be BIT-identical in
    both, and a context-dependent FMA contraction of `A + B*e` is the one
    f32 rewrite that could legally change the result between them.  The
    barrier forces `B*e` to be rounded separately everywhere XLA compiles
    the evaluation (jnp path, interpret-mode kernels).  `pin=False` is for
    kernel bodies lowered by Mosaic, where `optimization_barrier` has no
    lowering — and no pin is needed: Mosaic lowers the traced mul and add
    as separate vector ops with no cross-op contraction pass, so identical
    kernel IR yields identical numerics (asserted empirically by the
    on-hardware round-trip tests, scripts/tpu_parity.py)."""
    return jax.lax.optimization_barrier(x) if pin else x


def _cdf_eval(A, B, v_i32, S: int, kind: str, pin: bool = True):
    """cdf_int(v) as uint32 for v in [0, S].  A, B, v broadcast together.

    The multiply F*M stays below 2**31 so the f32->int32 trunc is exact-
    ranged; the +v then runs in uint32 so cdf_int(S) = 2**31 fits."""
    assert kind in _KINDS, kind
    vf = v_i32.astype(jnp.float32)
    if kind == "logit":
        e = jnp.log(vf) - jnp.log(jnp.float32(S) - vf)
    else:
        e = vf
    F = jax.nn.sigmoid(A + _nofma(B * e, pin))
    M = TOTAL_MASS - S
    # F*M in f32 can round UP past M (f32 spacing near 2**31 is 128) and the
    # f32->int32 conversion of 2**31 is saturation/UB — clamp first in f32 to
    # an exactly-representable value below 2**31, then to M in exact int32.
    prod = jnp.minimum(F * jnp.float32(M), jnp.float32(2147483520.0))  # 2**31 - 128
    base_i = jnp.minimum(prod.astype(jnp.int32), jnp.int32(M))
    base = jax.lax.bitcast_convert_type(base_i, _U32)
    cdf = base + jax.lax.bitcast_convert_type(v_i32, _U32)
    cdf = jnp.where(v_i32 == 0, _U32(0), cdf)
    cdf = jnp.where(v_i32 == S, _U32(TOTAL_MASS), cdf)
    return cdf


def _encode_pc(A, B, sym_i32, S: int, kind: str, pin: bool = True):
    """(p, c) uint32 for symbols s in [0, S): c = cdf(s), p = cdf(s+1)-c."""
    c = _cdf_eval(A, B, sym_i32, S, kind, pin)
    c_hi = _cdf_eval(A, B, sym_i32 + 1, S, kind, pin)
    return c_hi - c, c


def _search(A, B, masked, S: int, kind: str, pin: bool = True):
    """Binary search for s with cdf(s) <= masked < cdf(s+1).

    Exactly log2(S) iterations (S is a power of two); tracks the bounding
    cdf values so no extra evaluation is needed.  Comparisons run on int32
    bitcasts (all values < 2**31 except the never-compared top bound)."""
    steps = S.bit_length() - 1
    assert 1 << steps == S, S
    shape = jnp.broadcast_shapes(A.shape, masked.shape)
    lo_v = jnp.zeros(shape, jnp.int32)
    hi_v = jnp.full(shape, S, jnp.int32)
    c_lo = jnp.zeros(shape, _U32)
    c_hi = jnp.full(shape, TOTAL_MASS, dtype=jnp.uint32)
    m_i = jax.lax.bitcast_convert_type(masked, jnp.int32)
    for _ in range(steps):
        mid = (lo_v + hi_v) >> 1  # in [1, S-1]: never hits the forced ends
        cm = _cdf_eval(A, B, mid, S, kind, pin)
        le = jax.lax.bitcast_convert_type(cm, jnp.int32) <= m_i
        lo_v = jnp.where(le, mid, lo_v)
        c_lo = jnp.where(le, cm, c_lo)
        hi_v = jnp.where(le, hi_v, mid)
        c_hi = jnp.where(le, c_hi, cm)
    return lo_v, c_lo, c_hi - c_lo  # (s, c, p)


# ---------------------------------------------------------------------------
# pure-jnp window ops (CPU path; also the interpret-mode ground truth)
# ---------------------------------------------------------------------------


def encode_window_affine_jnp(hi, lo, A, B, syms, S: int, kind: str):
    """hi, lo: (L,) uint32 heads.  A, B: (seq, L) f32 sigmoid-argument
    coefficients; syms: (seq, L) int32.  Returns (hi, lo, words, mask) with
    the encode_window_jnp contract."""

    def step(carry, xs):
        hi, lo = carry
        At, Bt, st = xs
        p, c = _encode_pc(At, Bt, st, S, kind)
        hi, lo, word, pushed = _encode_step(hi, lo, p, c)
        return (hi, lo), (word, pushed)

    (hi, lo), (words, mask) = jax.lax.scan(step, (hi, lo), (A, B, syms))
    return hi, lo, words, mask


def decode_window_affine_jnp(hi, lo, A, B, window, S: int, kind: str):
    """Reverse-order decode over (seq, L) coefficient arrays; window
    (W, L) uint32 = pre-gathered pop words.  Returns (hi, lo, syms, npop)."""
    W = window.shape[0]

    def step(carry, xs):
        hi, lo, cnt = carry
        At, Bt = xs
        masked = lo & _U32(_MASK31)
        s, c, p = _search(At, Bt, masked, S, kind)
        new_hi, new_lo, renorm = _decode_transition(hi, lo, p, c, masked)
        word = jnp.take_along_axis(window, jnp.minimum(cnt, W - 1)[None], axis=0)[0]
        hi = jnp.where(renorm, new_lo, new_hi)
        lo = jnp.where(renorm, word, new_lo)
        cnt = cnt + renorm.astype(jnp.int32)
        return (hi, lo, cnt), s

    cnt0 = jnp.zeros(hi.shape, jnp.int32)
    (hi, lo, cnt), syms = jax.lax.scan(step, (hi, lo, cnt0), (A, B), reverse=True)
    return hi, lo, syms, cnt


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _encode_affine_kernel(S, kind, pin, a_ref, b_ref, syms_ref, hi_ref, lo_ref,
                          hi_out, lo_out, words_ref, mask_ref, regs):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        regs[0] = hi_ref[:]
        regs[1] = lo_ref[:]

    chunk = a_ref.shape[0]

    def body(t, carry):
        hi, lo = carry
        p, c = _encode_pc(a_ref[t], b_ref[t], syms_ref[t], S, kind, pin)
        hi, lo, word, pushed = _encode_step(hi, lo, p, c)
        words_ref[t] = word
        mask_ref[t] = _b2u(pushed)
        return hi, lo

    hi, lo = jax.lax.fori_loop(0, chunk, body, (regs[0], regs[1]))
    regs[0] = hi
    regs[1] = lo

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        hi_out[:] = hi
        lo_out[:] = lo


def _decode_affine_kernel(S, kind, pin, a_ref, b_ref, win_ref, hi_ref, lo_ref,
                          hi_out, lo_out, cnt_out, syms_ref, regs, cnt_regs):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        regs[0] = hi_ref[:]
        regs[1] = lo_ref[:]
        cnt_regs[0] = jnp.zeros_like(cnt_regs[0])

    chunk = a_ref.shape[0]
    W = win_ref.shape[0]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (W,) + win_ref.shape[1:], 0)
    win_i32 = jax.lax.bitcast_convert_type(win_ref[:], jnp.int32)

    def body(k, carry):
        hi, lo, cnt = carry
        t = chunk - 1 - k  # positions run backwards within the chunk
        masked = lo & _U32(_MASK31)
        s, c, p = _search(a_ref[t], b_ref[t], masked, S, kind, pin)
        new_hi, new_lo, renorm = _decode_transition(hi, lo, p, c, masked)
        word = _onehot_word(win_i32, kiota, cnt)
        hi = jnp.where(renorm, new_lo, new_hi)
        lo = jnp.where(renorm, word, new_lo)
        cnt = cnt + renorm.astype(jnp.int32)
        syms_ref[t] = s
        return hi, lo, cnt

    hi, lo, cnt = jax.lax.fori_loop(0, chunk, body, (regs[0], regs[1], cnt_regs[0]))
    regs[0] = hi
    regs[1] = lo
    cnt_regs[0] = cnt

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        hi_out[:] = hi
        lo_out[:] = lo
        cnt_out[:] = cnt


_AFFINE_CHUNK = 512


def _affine_chunk_cap(R: int) -> int:
    """Scale the seq-chunk down as the lane-row count R grows: VMEM block
    residency per grid step is ~5 (chunk, R, 128) buffers, and the proven
    envelope is chunk*R <= 512*8 (L=1024).  At L=2048 (R=16) a fixed 512
    chunk overflows scoped VMEM by exactly the last 32 KB (measured:
    'Ran out of memory in memory space vmem ... 16.03M and limit 16.00M',
    rgb_probe r5); halving the chunk restores headroom.  The envelope is
    not exactly chunk*R = const: the always-resident (R, 128) lane blocks
    and scratch grow with R and eat the slack — at R=32 (L=4096) chunk*R =
    4096 still overflowed by 80 KB (mnist_probe r5), so from R>=32 the cap
    halves once more."""
    cap = (_AFFINE_CHUNK * 8) // max(R, 8)
    if R >= 32:
        cap //= 2
    return max(32, cap)


def encode_window_affine_pallas(hi, lo, A, B, syms, S: int, kind: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq, L = A.shape
    R = -(-L // 128)
    Lp = R * 128
    hi_p = _pad_lanes(hi, 0, Lp, np.uint32(1)).reshape(R, 128)
    lo_p = _pad_lanes(lo, 0, Lp, np.uint32(0)).reshape(R, 128)
    # padding lanes encode symbol 0 under a flat-ish CDF; outputs discarded.
    a_p = _pad_lanes(A, 1, Lp, 0.0).reshape(seq, R, 128)
    b_p = _pad_lanes(B, 1, Lp, 0.0).reshape(seq, R, 128)
    s_p = _pad_lanes(syms, 1, Lp, 0).reshape(seq, R, 128)

    chunk = _largest_chunk(seq, _affine_chunk_cap(R))
    grid = seq // chunk
    lane_spec = pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((chunk, R, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    hi2, lo2, words, mask = pl.pallas_call(
        functools.partial(_encode_affine_kernel, S, kind, _interpret()),
        grid=(grid,),
        in_specs=[seq_spec, seq_spec, seq_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, seq_spec, seq_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((seq, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((seq, R, 128), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((2, R, 128), jnp.uint32)],
        interpret=_interpret(),
    )(a_p, b_p, s_p, hi_p, lo_p)

    hi2 = hi2.reshape(Lp)[:L]
    lo2 = lo2.reshape(Lp)[:L]
    words = words.reshape(seq, Lp)[:, :L]
    mask = mask.reshape(seq, Lp)[:, :L] != 0
    return hi2, lo2, words, mask


def decode_window_affine_pallas(hi, lo, A, B, window, S: int, kind: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq, L = A.shape
    W = window.shape[0]
    R = -(-L // 128)
    Lp = R * 128
    hi_p = _pad_lanes(hi, 0, Lp, np.uint32(1)).reshape(R, 128)
    lo_p = _pad_lanes(lo, 0, Lp, np.uint32(0)).reshape(R, 128)
    a_p = _pad_lanes(A, 1, Lp, 0.0).reshape(seq, R, 128)
    b_p = _pad_lanes(B, 1, Lp, 0.0).reshape(seq, R, 128)
    win_p = _pad_lanes(window, 1, Lp, np.uint32(0)).reshape(W, R, 128)

    chunk = _largest_chunk(seq, _affine_chunk_cap(R))
    grid = seq // chunk
    rev = lambda g: (grid - 1 - g, 0, 0)  # noqa: E731 — consumed from the end
    lane_spec = pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((chunk, R, 128), rev, memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((W, R, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)

    hi2, lo2, cnt, syms = pl.pallas_call(
        functools.partial(_decode_affine_kernel, S, kind, _interpret()),
        grid=(grid,),
        in_specs=[seq_spec, seq_spec, win_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec,
                   pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                   seq_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((seq, R, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.uint32),
            pltpu.VMEM((1, R, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(a_p, b_p, win_p, hi_p, lo_p)

    hi2 = hi2.reshape(Lp)[:L]
    lo2 = lo2.reshape(Lp)[:L]
    cnt = cnt.reshape(Lp)[:L]
    syms = syms.reshape(seq, Lp)[:, :L]
    return hi2, lo2, syms, cnt


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def encode_window_affine(hi, lo, A, B, syms, S: int, kind: str):
    impl = encode_window_affine_pallas if use_pallas() else encode_window_affine_jnp
    return impl(hi, lo, A, B, syms, S, kind)


def decode_window_affine(hi, lo, A, B, window, S: int, kind: str):
    impl = decode_window_affine_pallas if use_pallas() else decode_window_affine_jnp
    return impl(hi, lo, A, B, window, S, kind)


@functools.cache
def fused_self_check() -> bool:
    """Once-per-process encode/decode round trip through the fused kernels.

    The fused path's exactness rests on the encode and decode kernels
    evaluating `_cdf_eval` bit-identically.  On Mosaic-lowered TPU kernels
    that is an EMPIRICAL compiler property (`_nofma` pins only jnp/interpret
    paths; Mosaic has no optimization_barrier lowering and today performs no
    cross-op FMA contraction).  A future Mosaic/XLA upgrade could silently
    break the agreement and corrupt any stream decoded without the verify
    pass — so the codec runs this cheap structural check before the first
    fused op of a process: encode one window of boundary-stressing symbols
    under sharp CDFs (both `kind`s), decode it back, and demand bit equality
    of symbols and restored heads.  Raises RuntimeError on disagreement.
    Set BITSWAP_TPU_SKIP_SELFCHECK=1 to bypass (e.g. micro-benchmarks that
    must not pay the one-off compile).
    """
    import os

    if os.environ.get("BITSWAP_TPU_SKIP_SELFCHECK") == "1":
        return True

    from bitswap_tpu.ans.vectorized import (
        ans_decode_lanes_affine,
        ans_encode_lanes_affine,
        init_lane_state,
        lane_states_equal,
    )

    L, seq, S = 8, 96, 1024
    rng = np.random.default_rng(1234)
    # sharp scales (B = 1/scale large) push CDF mass against bin boundaries —
    # the regime where a single-ulp disagreement between the two kernels
    # would flip a symbol
    mu = rng.normal(0.0, 2.0, (seq, L)).astype(np.float32)
    scale = rng.uniform(5e-3, 0.5, (seq, L)).astype(np.float32)
    syms = rng.integers(0, S, (L, seq), dtype=np.int32)

    state0 = init_lane_state(L, capacity=1024, seed=7, init_words=64)

    @jax.jit
    def roundtrip(state, A, B, syms):
        st = ans_encode_lanes_affine(state, A, B, S, "linear", syms)
        st, dec_lin = ans_decode_lanes_affine(st, A, B, S, "linear")
        ok_lin = jnp.all(dec_lin == syms)
        st2 = ans_encode_lanes_affine(st, A, B, S, "logit", syms)
        st2, dec_log = ans_decode_lanes_affine(st2, A, B, S, "logit")
        ok_log = jnp.all(dec_log == syms)
        return ok_lin, ok_log, st2

    A = jnp.asarray(-mu / scale)
    B = jnp.asarray(1.0 / scale)
    ok_lin, ok_log, st_back = roundtrip(state0, A, B, jnp.asarray(syms))
    ok_state = bool(np.all(np.asarray(lane_states_equal(st_back, state0))))
    if not (bool(ok_lin) and bool(ok_log) and ok_state):
        raise RuntimeError(
            "fused-coder self-check FAILED: the encode and decode kernels "
            "disagree on this backend "
            f"(linear={bool(ok_lin)}, logit={bool(ok_log)}, state={ok_state}). "
            "The compiler likely started contracting mul+add across ops "
            "inside Mosaic kernels (see _nofma). Use coder='tables' until "
            "the kernels are re-pinned."
        )
    return True
