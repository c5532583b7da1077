"""Pallas TPU kernels for the lane-parallel rANS state machine.

The coder's per-symbol recurrence (reference: mnist_compress.py:49-68) is
inherently sequential along the symbol axis, so the only parallel axis is
the lane axis (independent streams).  ans/vectorized.py expresses the
recurrence as a `lax.scan`; on TPU each scan step pays XLA loop overhead and
a scatter/gather against the (L, capacity) HBM stream buffer.  These kernels
instead run the whole symbol loop inside one Pallas invocation with the head
registers held in vector registers / VMEM scratch, and convert the stream
side-effects into *windowed* dense I/O:

- **encode window**: one renormalization test per symbol pushes at most one
  word, so an op over `seq` symbols emits a dense (seq, L) word array plus a
  push mask; the caller compacts and appends to the stream buffer with ONE
  scatter per op (vectorized.py used one per symbol).
- **decode window**: at most one word is popped per symbol, so the caller
  pre-gathers the top `seq` stack words per lane (reversed: window[k] = k-th
  pop) and the kernel consumes them via a one-hot gather over the window —
  TPU has no per-lane dynamic gather, but a masked sum over the sublane axis
  vectorizes perfectly on the VPU.

Layout: lanes ride the 128-wide *lane* axis of the VPU, in R = L/128
sublane rows, so one vector instruction advances up to 8*128 = 1024 streams.
All per-position arrays are "lanes-last": (seq, R, 128).  The decode CDF
table is (seq, S, R, 128) uint32 with S = support (entry S, always 2**31, is
implicit) — built directly in this layout by tables.build_tables_ll so the
512MB-class table is never transposed.

Exactness: identical uint32 limb arithmetic to ans/vectorized.py (the f32
division estimate is corrected exactly); streams are bit-identical between
the jnp and Pallas paths — tests/test_pallas.py asserts this.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans.tables import PRECISION_BITS, TOTAL_MASS

_U32 = jnp.uint32
_MASK31 = np.uint32((1 << PRECISION_BITS) - 1)

# VMEM budget for one copy of a decode grid step's blocks (cdf chunk + word
# window + syms out).  Mosaic double-buffers pipelined blocks and enforces a
# 16MB *scoped* vmem stack limit, so the effective footprint is ~2x this plus
# scratch — 4MB keeps the observed usage comfortably under the limit.
_DECODE_VMEM_BUDGET = 4 * 1024 * 1024
_ENCODE_CHUNK = 512


def _decode_chunk_cap(S: int, R: int, window_words: int,
                      syms_R: Optional[int] = None) -> int:
    """Largest cdf-chunk length whose grid-step blocks fit the budget: the
    always-resident window block is charged first, then each chunk unit costs
    one (S, R, 128) cdf row plus one (syms_R, 128) syms row.  syms_R defaults
    to R; the shared-table path charges cdf rows at 1 sublane but its syms
    block is still R sublanes per chunk unit."""
    row = R * 128 * 4
    syms_row = (R if syms_R is None else syms_R) * 128 * 4
    avail = _DECODE_VMEM_BUDGET - window_words * row
    return max(1, avail // (S * row + syms_row))


# ---------------------------------------------------------------------------
# Mosaic-safe dtype bridges
#
# The TPU Pallas lowering (Mosaic) supports neither unsigned<->float casts
# nor bool->unsigned casts; everything routes through int32.  All helpers
# are value-exact for the ranges the coder uses and are no-ops semantically
# on the CPU/jnp path.
# ---------------------------------------------------------------------------


def _b2u(b):
    """bool -> uint32 (0/1)."""
    return jax.lax.bitcast_convert_type(b.astype(jnp.int32), _U32)


def _u2f_small(x):
    """uint32 < 2**31 -> float32 (same rounding as a direct u32 cast)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.float32)


def _u2f_full(x):
    """Full-range uint32 -> float32 via exact 16-bit halves (one rounding in
    the final add; see _div_digit's error budget)."""
    hi = jax.lax.bitcast_convert_type(x >> _U32(16), jnp.int32).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(x & _U32(0xFFFF), jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _f2u_small(x):
    """float32 in [0, 2**31) -> uint32 (trunc)."""
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), _U32)


# ---------------------------------------------------------------------------
# shared uint32 limb arithmetic (usable both in kernels and in jnp)
# ---------------------------------------------------------------------------


def _mul_u32_u32(a, b):
    """Exact 32x32 -> 64 bit multiply via 16-bit limbs; returns (hi, lo)."""
    a0 = a & _U32(0xFFFF)
    a1 = a >> _U32(16)
    b0 = b & _U32(0xFFFF)
    b1 = b >> _U32(16)
    ll = a0 * b0
    mid = a0 * b1 + (ll >> _U32(16))
    mid2 = a1 * b0 + (mid & _U32(0xFFFF))
    lo = (mid2 << _U32(16)) | (ll & _U32(0xFFFF))
    hi = a1 * b1 + (mid >> _U32(16)) + (mid2 >> _U32(16))
    return hi, lo


def _div_digit(y_hi, y_lo, p):
    """One 16-bit quotient digit of divmod(y_hi*2**32 + y_lo, p); quotient
    must be < 2**16 (guaranteed by the caller's digit decomposition).  f32
    estimate corrected exactly in uint32 (see vectorized.py for the error
    analysis; the extra rounding of the two-part u32->f32 bridge keeps the
    relative error ~2**-22, so |d_est - d| <= 2**16 * 2**-22 << 1 and the
    two-step corrections below still clamp to the exact quotient)."""
    F = jnp.float32
    yf = _u2f_small(y_hi) * F(4294967296.0) + _u2f_full(y_lo)
    d = _f2u_small(jnp.floor(yf / _u2f_small(p)))
    m_hi, m_lo = _mul_u32_u32(d, p)
    borrow = _b2u(y_lo < m_lo)
    r_lo = y_lo - m_lo
    r_hi = y_hi - m_hi - borrow
    for _ in range(2):  # d too high: remainder negative
        neg = (r_hi >> _U32(31)) & _U32(1)
        d = d - neg
        add = r_lo + neg * p
        carry = _b2u(add < r_lo)
        r_lo = add
        r_hi = r_hi + carry
    for _ in range(2):  # d too low: remainder >= p
        big = _b2u((r_hi > _U32(0)) | (r_lo >= p))
        d = d + big
        sub_borrow = _b2u(r_lo < big * p)
        r_lo = r_lo - big * p
        r_hi = r_hi - sub_borrow
    return d, r_lo


def _divmod_head_by_p(hi, lo, p):
    """(q_hi, q_lo, r) = divmod(hi*2**32 + lo, p) under the post-renorm
    invariant hi < 2p."""
    ge = _b2u(hi >= p)
    q_hi = ge
    r1 = hi - ge * p
    d1, rem1 = _div_digit(r1 >> _U32(16), (r1 << _U32(16)) | (lo >> _U32(16)), p)
    d2, r = _div_digit(rem1 >> _U32(16), (rem1 << _U32(16)) | (lo & _U32(0xFFFF)), p)
    return q_hi, (d1 << _U32(16)) | d2, r


def _encode_step(hi, lo, p, c):
    """One rANS encode transition (push deferred to the caller): returns
    (new_hi, new_lo, word, pushed) where `word` is only meaningful when
    `pushed`."""
    renorm = hi >= (p << _U32(1))
    word = lo
    lo = jnp.where(renorm, hi, lo)
    hi = jnp.where(renorm, _U32(0), hi)
    q_hi, q_lo, r = _divmod_head_by_p(hi, lo, p)
    add = r + c
    new_lo = (q_lo << _U32(31)) + add
    new_hi = (q_hi << _U32(31)) | (q_lo >> _U32(1))
    return new_hi, new_lo, word, renorm


def _decode_transition(hi, lo, p, c, masked):
    """The head update x = p*(x >> 31) + (x & mask31) - c; returns
    (new_hi, new_lo, renorm) where renorm means a word must be popped."""
    t_hi = hi >> _U32(31)
    t_lo = (hi << _U32(1)) | (lo >> _U32(31))
    m_hi, m_lo = _mul_u32_u32(p, t_lo)
    m_hi = m_hi + t_hi * p
    delta = masked - c
    new_lo = m_lo + delta
    carry_bit = _b2u(new_lo < m_lo)
    new_hi = m_hi + carry_bit
    return new_hi, new_lo, new_hi == _U32(0)


def _search_row(block, masked):
    """Symbol lookup over one lanes-last CDF block.

    block: (S, ...) uint32 exclusive-cumulative entries 0..S-1 (entry S =
    2**31 implicit); masked: (...) the low 31 head bits.  Returns
    (s int32, c, p) — gather-free: c = max of entries <= masked (cdf is
    monotone), cdf[s+1] = min of entries > masked (default 2**31).

    All reductions run on an int32 bitcast: every cdf entry and `masked` is
    < 2**31, where signed and unsigned order coincide — Mosaic cannot lower
    reductions over unsigned integers (the round-1 TPU failure).  The one
    out-of-range value, the implicit final entry 2**31, is handled by the
    s == S-1 fixup below instead of an int32 sentinel."""
    S = block.shape[0]
    bi = jax.lax.bitcast_convert_type(block, jnp.int32)
    mi = jax.lax.bitcast_convert_type(masked, jnp.int32)
    le = bi <= mi[None]
    s = jnp.sum(le.astype(jnp.int32), axis=0, dtype=jnp.int32) - 1
    c_i = jnp.max(jnp.where(le, bi, jnp.int32(0)), axis=0)
    nxt_i = jnp.min(jnp.where(le, jnp.int32(0x7FFFFFFF), bi), axis=0)
    c = jax.lax.bitcast_convert_type(c_i, _U32)
    # s == S-1 ⟺ every entry <= masked ⟺ cdf[s+1] is the implicit 2**31
    nxt = jnp.where(
        s == jnp.int32(S - 1),
        _U32(TOTAL_MASS),
        jax.lax.bitcast_convert_type(nxt_i, _U32),
    )
    return s, c, nxt - c


def _onehot_word(win_i32, kiota, cnt):
    """Select window word k == cnt per lane via a masked int32 sum (TPU has
    no per-lane dynamic gather; Mosaic cannot reduce unsigned ints, so the
    window is pre-bitcast to int32 — the sum has exactly one non-zero term,
    so it is bit-exact regardless of sign)."""
    onehot = kiota == cnt[None]
    word_i = jnp.sum(jnp.where(onehot, win_i32, jnp.int32(0)), axis=0, dtype=jnp.int32)
    return jax.lax.bitcast_convert_type(word_i, _U32)


# ---------------------------------------------------------------------------
# pure-jnp window ops (portable reference; used on CPU and in tests)
# ---------------------------------------------------------------------------


def encode_window_jnp(hi, lo, p, c):
    """hi, lo: (L,) uint32 heads.  p, c: (seq, L) uint32 per-position
    frequency and cumulative base.  Returns (hi, lo, words (seq, L) uint32,
    mask (seq, L) bool) — words[t] was pushed before coding position t iff
    mask[t]."""

    def step(carry, xs):
        hi, lo = carry
        pt, ct = xs
        hi, lo, word, pushed = _encode_step(hi, lo, pt, ct)
        return (hi, lo), (word, pushed)

    (hi, lo), (words, mask) = jax.lax.scan(step, (hi, lo), (p, c))
    return hi, lo, words, mask


def decode_window_jnp(hi, lo, cdf, window):
    """hi, lo: (L,) uint32.  cdf: (seq, S, L) uint32 lanes-last tables
    (entries 0..S-1).  window: (W, L) uint32, window[k] = k-th word popped.
    Returns (hi, lo, syms (seq, L) int32, npop (L,) int32).

    Positions are processed in reverse (symbols return in natural order),
    mirroring the reference ANS.decode."""
    W = window.shape[0]

    def step(carry, cdf_row):
        hi, lo, cnt = carry
        masked = lo & _U32(_MASK31)
        s, c, p = _search_row(cdf_row, masked)
        new_hi, new_lo, renorm = _decode_transition(hi, lo, p, c, masked)
        word = jnp.take_along_axis(window, jnp.minimum(cnt, W - 1)[None], axis=0)[0]
        hi = jnp.where(renorm, new_lo, new_hi)
        lo = jnp.where(renorm, word, new_lo)
        cnt = cnt + renorm.astype(jnp.int32)
        return (hi, lo, cnt), s

    cnt0 = jnp.zeros(hi.shape, jnp.int32)
    (hi, lo, cnt), syms = jax.lax.scan(step, (hi, lo, cnt0), cdf, reverse=True)
    return hi, lo, syms, cnt


def decode_window_shared_jnp(hi, lo, cdf_shared, window):
    """decode_window_jnp with one lane-shared table: cdf_shared (seq, S)."""
    return decode_window_jnp(hi, lo, cdf_shared[..., None], window)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _encode_kernel(p_ref, c_ref, hi_ref, lo_ref,
                   hi_out, lo_out, words_ref, mask_ref, regs):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        regs[0] = hi_ref[:]
        regs[1] = lo_ref[:]

    chunk = p_ref.shape[0]

    def body(t, carry):
        hi, lo = carry
        hi, lo, word, pushed = _encode_step(hi, lo, p_ref[t], c_ref[t])
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


def _decode_kernel(cdf_ref, win_ref, hi_ref, lo_ref,
                   hi_out, lo_out, cnt_out, syms_ref, regs, cnt_regs):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        regs[0] = hi_ref[:]
        regs[1] = lo_ref[:]
        cnt_regs[0] = jnp.zeros_like(cnt_regs[0])

    chunk = cdf_ref.shape[0]
    W = win_ref.shape[0]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (W,) + win_ref.shape[1:], 0)
    win_i32 = jax.lax.bitcast_convert_type(win_ref[:], jnp.int32)

    def body(k, carry):
        hi, lo, cnt = carry
        t = chunk - 1 - k  # positions run backwards within the chunk
        masked = lo & _U32(_MASK31)
        s, c, p = _search_row(cdf_ref[t], masked)
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


def _decode_kernel_shared(cdf_ref, win_ref, hi_ref, lo_ref,
                          hi_out, lo_out, cnt_out, syms_ref, regs, cnt_regs):
    """Decode with a lane-shared CDF table: cdf_ref block is (chunk, S, 1, 128)
    — the per-position row is broadcast across all R sublane rows in-kernel
    (used for the Logistic(0,1) top-prior ops, where materializing a
    (seq, S, L) per-lane table would waste HBM when L > 128).  The table
    arrives pre-broadcast along a single 128-lane tile because Mosaic can
    neither lower the (S,) -> (S, 1, 1) shape cast in-kernel (unsupported
    reshape across lanes) nor store trailing (1, 1) dims without padding the
    lane tile 128x (VMEM blow-up)."""
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        regs[0] = hi_ref[:]
        regs[1] = lo_ref[:]
        cnt_regs[0] = jnp.zeros_like(cnt_regs[0])

    chunk = cdf_ref.shape[0]
    W = win_ref.shape[0]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (W,) + win_ref.shape[1:], 0)
    win_i32 = jax.lax.bitcast_convert_type(win_ref[:], jnp.int32)

    def body(k, carry):
        hi, lo, cnt = carry
        t = chunk - 1 - k
        masked = lo & _U32(_MASK31)
        block = cdf_ref[t]  # (S, 1, 128), broadcasts over (R, 128)
        s, c, p = _search_row(block, masked)
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


def _pad_lanes(x, lanes_axis, pad_to, fill):
    L = x.shape[lanes_axis]
    if L == pad_to:
        return x
    widths = [(0, 0)] * x.ndim
    widths[lanes_axis] = (0, pad_to - L)
    return jnp.pad(x, widths, constant_values=fill)


def _largest_chunk(seq: int, cap: int) -> int:
    """Largest divisor of `seq` that is <= cap (>=1)."""
    c = min(cap, seq)
    while seq % c:
        c -= 1
    return c


def encode_window_pallas(hi, lo, p, c):
    """Same contract as encode_window_jnp, TPU Pallas implementation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq, L = p.shape
    R = -(-L // 128)
    Lp = R * 128
    # padding lanes: p = 2**30 (renorm test exact, no wrap), c = 0, head at
    # the encode invariant floor so the math stays in range; outputs for
    # padded lanes are discarded.
    hi_p = _pad_lanes(hi, 0, Lp, np.uint32(1)).reshape(R, 128)
    lo_p = _pad_lanes(lo, 0, Lp, np.uint32(0)).reshape(R, 128)
    p_p = _pad_lanes(p, 1, Lp, np.uint32(1 << 30)).reshape(seq, R, 128)
    c_p = _pad_lanes(c, 1, Lp, np.uint32(0)).reshape(seq, R, 128)

    # scale the chunk down with the lane-row count (same VMEM envelope as
    # ans/fused.py:_affine_chunk_cap, incl. the extra halving from R>=32:
    # the (R, 128) lane blocks eat the slack at high lane counts)
    cap = (_ENCODE_CHUNK * 8) // max(R, 8)
    if R >= 32:
        cap //= 2
    chunk = _largest_chunk(seq, max(32, cap))
    grid = seq // chunk
    lane_spec = pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((chunk, R, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    hi2, lo2, words, mask = pl.pallas_call(
        _encode_kernel,
        grid=(grid,),
        in_specs=[seq_spec, seq_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, seq_spec, seq_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((seq, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((seq, R, 128), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((2, R, 128), jnp.uint32)],
        interpret=_interpret(),
    )(p_p, c_p, hi_p, lo_p)

    hi2 = hi2.reshape(Lp)[:L]
    lo2 = lo2.reshape(Lp)[:L]
    words = words.reshape(seq, Lp)[:, :L]
    mask = mask.reshape(seq, Lp)[:, :L] != 0
    return hi2, lo2, words, mask


def _decode_max_lane_rows(S: int, W: int) -> int:
    """Lane-row cap per decode-kernel invocation.  The decode kernels' search
    and word-select temporaries live in Mosaic scoped VMEM and scale as
    max(S, W) * R * 128 * 4B; the proven fit is S*R = 8*1024 (S=1024 at
    R=8, L=1024 — every table-mode bench/sweep).  R=16 measured 440KB over
    the 16MB scoped limit and R=32 5.95M over (L=4096 repro, mnist_probe
    r5).  Wider states split into lane groups of this many rows per call."""
    return max(1, (8 * 1024) // max(S, W, 1))


def _split_lanes(fn, n_tab_axes, hi, lo, tab, window, max_rows):
    """Run a decode kernel in lane groups of max_rows*128 and concatenate.
    tab is sliced on its last axis when it carries lanes (n_tab_axes=3,
    lanes-last table); passed through whole otherwise (shared table)."""
    L = hi.shape[0]
    g = max_rows * 128
    parts = []
    for s in range(0, L, g):
        e = min(s + g, L)
        t = tab[:, :, s:e] if n_tab_axes == 3 else tab
        parts.append(fn(hi[s:e], lo[s:e], t, window[:, s:e]))
    return (
        jnp.concatenate([p[0] for p in parts]),
        jnp.concatenate([p[1] for p in parts]),
        jnp.concatenate([p[2] for p in parts], axis=1),
        jnp.concatenate([p[3] for p in parts]),
    )


def decode_window_pallas(hi, lo, cdf, window):
    """Same contract as decode_window_jnp, TPU Pallas implementation.
    cdf: (seq, S, L) uint32; window: (W, L) uint32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq, S, L = cdf.shape
    max_rows = _decode_max_lane_rows(S, window.shape[0])
    if -(-L // 128) > max_rows:
        return _split_lanes(decode_window_pallas, 3, hi, lo, cdf, window, max_rows)
    W = window.shape[0]
    R = -(-L // 128)
    Lp = R * 128

    hi_p = _pad_lanes(hi, 0, Lp, np.uint32(1)).reshape(R, 128)
    lo_p = _pad_lanes(lo, 0, Lp, np.uint32(0)).reshape(R, 128)
    # padding-lane rows decode garbage symbols but never divide by zero:
    # the implicit final entry keeps p >= 1 even for an all-zero row.
    cdf_p = _pad_lanes(cdf, 2, Lp, np.uint32(0)).reshape(seq, S, R, 128)
    win_p = _pad_lanes(window, 1, Lp, np.uint32(0)).reshape(W, R, 128)

    cap = _decode_chunk_cap(S, R, W)
    chunk = _largest_chunk(seq, cap)
    grid = seq // chunk
    # chunks are consumed from the END of the sequence backwards
    rev = lambda g: (grid - 1 - g, 0, 0, 0)  # noqa: E731
    lane_spec = pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
    cdf_spec = pl.BlockSpec((chunk, S, R, 128), rev, memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((W, R, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((chunk, R, 128), lambda g: (grid - 1 - g, 0, 0),
                            memory_space=pltpu.VMEM)

    hi2, lo2, cnt, syms = pl.pallas_call(
        _decode_kernel,
        grid=(grid,),
        in_specs=[cdf_spec, win_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec,
                   pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                   sym_spec),
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
    )(cdf_p, win_p, hi_p, lo_p)

    hi2 = hi2.reshape(Lp)[:L]
    lo2 = lo2.reshape(Lp)[:L]
    cnt = cnt.reshape(Lp)[:L]
    syms = syms.reshape(seq, Lp)[:, :L]
    return hi2, lo2, syms, cnt


def decode_window_shared_pallas(hi, lo, cdf_shared, window):
    """Shared-table decode: cdf_shared (seq, S) uint32 broadcast across all
    lanes inside the kernel (no (seq, S, L) materialization)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq, S = cdf_shared.shape
    L = hi.shape[0]
    W = window.shape[0]
    R = -(-L // 128)
    max_rows = _decode_max_lane_rows(S, W)
    if R > max_rows:
        return _split_lanes(decode_window_shared_pallas, 2, hi, lo,
                            cdf_shared, window, max_rows)
    Lp = R * 128

    hi_p = _pad_lanes(hi, 0, Lp, np.uint32(1)).reshape(R, 128)
    lo_p = _pad_lanes(lo, 0, Lp, np.uint32(0)).reshape(R, 128)
    win_p = _pad_lanes(window, 1, Lp, np.uint32(0)).reshape(W, R, 128)

    cap = _decode_chunk_cap(S, 1, W * R, syms_R=R)  # 1-sublane cdf rows; R-sublane syms
    chunk = _largest_chunk(seq, cap)
    grid = seq // chunk
    # pre-broadcast along one 128-lane tile: see _decode_kernel_shared
    cdf4 = jnp.broadcast_to(cdf_shared[:, :, None, None], (seq, S, 1, 128))
    lane_spec = pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
    cdf_spec = pl.BlockSpec((chunk, S, 1, 128), lambda g: (grid - 1 - g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((W, R, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    sym_spec = pl.BlockSpec((chunk, R, 128), lambda g: (grid - 1 - g, 0, 0),
                            memory_space=pltpu.VMEM)

    hi2, lo2, cnt, syms = pl.pallas_call(
        _decode_kernel_shared,
        grid=(grid,),
        in_specs=[cdf_spec, win_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec,
                   pl.BlockSpec((R, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                   sym_spec),
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
    )(cdf4, win_p, hi_p, lo_p)

    hi2 = hi2.reshape(Lp)[:L]
    lo2 = lo2.reshape(Lp)[:L]
    cnt = cnt.reshape(Lp)[:L]
    syms = syms.reshape(seq, Lp)[:, :L]
    return hi2, lo2, syms, cnt


# ---------------------------------------------------------------------------
# backend dispatch
# ---------------------------------------------------------------------------


@functools.cache
def _interpret() -> bool:
    """Interpreter mode when not on a real TPU backend (CPU tests)."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except RuntimeError:
        return True


@functools.cache
def use_pallas() -> bool:
    """Pallas kernels on TPU-class backends, jnp elsewhere.  Override with
    BITSWAP_TPU_CODER=pallas|jnp."""
    import os

    mode = os.environ.get("BITSWAP_TPU_CODER", "auto")
    if mode == "pallas":
        return True
    if mode == "jnp":
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")


def encode_window(hi, lo, p, c):
    impl = encode_window_pallas if use_pallas() else encode_window_jnp
    return impl(hi, lo, p, c)


def decode_window(hi, lo, cdf, window):
    impl = decode_window_pallas if use_pallas() else decode_window_jnp
    return impl(hi, lo, cdf, window)


def decode_window_shared(hi, lo, cdf_shared, window):
    impl = decode_window_shared_pallas if use_pallas() else decode_window_shared_jnp
    return impl(hi, lo, cdf_shared, window)
