"""Lane-parallel rANS coder in pure uint32 JAX — the TPU-resident state machine.

Re-implements the reference's per-symbol Python big-int loop
(mnist_compress.py:49-68) as a `lax.scan` over symbol positions, vectorized
over L independent stream lanes.  Each lane is a full ANS stack (32-bit word
buffer + 64-bit head); lanes never interact, so L blocks/images/experiments
are coded in lockstep on the VPU instead of one at a time on the host.

TPU has no native 64-bit integers, so the 64-bit head is held as two uint32
limbs (hi, lo).  The state-machine arithmetic stays exact in uint32:

- encode renormalization test  x >= p << 33  ⟺  hi >= 2p   (2p < 2**32);
- after renormalization x < 2**32, hence the head always satisfies
  hi < 2p entering the division, so  q = x // p  decomposes as
  q_hi = (hi >= p) and a 32-step bit-serial long division of the low word
  (each partial remainder r < p < 2**31, so 2r + bit < 2**32 never wraps);
- decode's  pmf * (x >> 31)  is a 32x32 -> 64 multiply via 16-bit limbs.

Frequencies come from the cdf table alone (pmf[s] = cdf[s+1] - cdf[s]), so
the coder carries one (L, seq, support+1) uint32 table per op and no pmf.

State layout (a pytree, device-resident across the whole codec loop):
    buf  (L, capacity) uint32 — stream word stack, grows upward
    sp   (L,) int32           — number of words on the stack
    hi, lo (L,) uint32        — the 64-bit head, hi*2**32 + lo in [2**32, 2**64)
    overflow/underflow (L,) bool — sticky error flags (capacity exhausted /
                                   popped past the stack bottom)
Equivalence to the reference's list representation: state == buf[:sp] + [head].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans.tables import PRECISION_BITS

_MASK31 = np.uint32((1 << PRECISION_BITS) - 1)
_U32 = jnp.uint32


class LaneState(NamedTuple):
    buf: jnp.ndarray  # (L, capacity) uint32
    sp: jnp.ndarray  # (L,) int32
    hi: jnp.ndarray  # (L,) uint32
    lo: jnp.ndarray  # (L,) uint32
    overflow: jnp.ndarray  # (L,) bool
    underflow: jnp.ndarray  # (L,) bool

    @property
    def num_lanes(self) -> int:
        return self.buf.shape[0]

    @property
    def capacity(self) -> int:
        return self.buf.shape[1]


def init_lane_state(
    num_lanes: int,
    capacity: int,
    seed: int = 100,
    init_words: int = 10000,
    per_lane_seeds: bool = True,
) -> LaneState:
    """Fresh lane states filled with the reference's 'random initial bits'.

    Mirrors mnist_compress.py:158-159: `init_words` uint32 draws in
    [2**16, 2**32-1) per lane, the last one becoming the upper head limb
    (head = word << 32).  Lane 0 with `per_lane_seeds=False` reproduces the
    reference's single-stream init for seed parity tests.
    """
    assert capacity >= init_words
    buf = np.zeros((num_lanes, capacity), dtype=np.uint32)
    hi = np.zeros((num_lanes,), dtype=np.uint32)
    for lane in range(num_lanes):
        rng = np.random.RandomState(seed + lane if per_lane_seeds else seed)
        words = rng.randint(low=1 << 16, high=(1 << 32) - 1, size=init_words, dtype=np.uint32)
        buf[lane, : init_words - 1] = words[:-1]
        hi[lane] = words[-1]
    return LaneState(
        buf=jnp.asarray(buf),
        sp=jnp.full((num_lanes,), init_words - 1, dtype=jnp.int32),
        hi=jnp.asarray(hi),
        lo=jnp.zeros((num_lanes,), dtype=jnp.uint32),
        overflow=jnp.zeros((num_lanes,), dtype=bool),
        underflow=jnp.zeros((num_lanes,), dtype=bool),
    )


def lane_state_to_ref_lists(state: LaneState):
    """Per-lane reference-style state lists (words + combined head) for tests
    and container serialization."""
    buf = np.asarray(state.buf)
    sp = np.asarray(state.sp)
    hi = np.asarray(state.hi).astype(np.uint64)
    lo = np.asarray(state.lo).astype(np.uint64)
    out = []
    for lane in range(state.num_lanes):
        head = (int(hi[lane]) << 32) | int(lo[lane])
        out.append(list(map(int, buf[lane, : sp[lane]])) + [head])
    return out


def lane_state_from_ref_lists(states, capacity: int) -> LaneState:
    """Inverse of `lane_state_to_ref_lists`."""
    num_lanes = len(states)
    buf = np.zeros((num_lanes, capacity), dtype=np.uint32)
    sp = np.zeros((num_lanes,), dtype=np.int32)
    hi = np.zeros((num_lanes,), dtype=np.uint32)
    lo = np.zeros((num_lanes,), dtype=np.uint32)
    for lane, s in enumerate(states):
        words, head = s[:-1], int(s[-1])
        assert len(words) <= capacity
        buf[lane, : len(words)] = np.asarray(words, dtype=np.uint32)
        sp[lane] = len(words)
        hi[lane] = (head >> 32) & 0xFFFFFFFF
        lo[lane] = head & 0xFFFFFFFF
    return LaneState(
        buf=jnp.asarray(buf),
        sp=jnp.asarray(sp),
        hi=jnp.asarray(hi),
        lo=jnp.asarray(lo),
        overflow=jnp.zeros((num_lanes,), dtype=bool),
        underflow=jnp.zeros((num_lanes,), dtype=bool),
    )


# ---------------------------------------------------------------------------
# uint32 limb arithmetic helpers
# ---------------------------------------------------------------------------


def _div_digit(y_hi, y_lo, p):
    """One 16-bit quotient digit: (d, r_hi, r_lo) = divmod(y_hi*2**32+y_lo, p)
    where the caller guarantees quotient < 2**16 (i.e. y < p*2**16, so
    y_hi < 2**15 since p < 2**31).

    The digit is estimated with an f32 reciprocal and corrected exactly in
    uint32.  Error analysis: y_hi < 2**15 converts to f32 exactly and the
    2**32 scale is a power of two, so |yf - y| <= 2**-23*y; the reciprocal
    and product each add <= 2**-24 relative error; with d < 2**16 the
    absolute quotient error is < 0.03, so after floor the estimate is within
    +/-1 of the true digit.  Two branch-free correction rounds per side keep
    a safety margin.
    """
    F = jnp.float32
    yf = y_hi.astype(F) * F(4294967296.0) + y_lo.astype(F)
    d = jnp.floor(yf / p.astype(F)).astype(_U32)
    m_hi, m_lo = _mul_u32_u32(d, p)
    borrow = (y_lo < m_lo).astype(_U32)
    r_lo = y_lo - m_lo
    r_hi = y_hi - m_hi - borrow  # two's-complement pair; negative iff d high
    for _ in range(2):  # d too high: rem negative (top bit of r_hi set)
        neg = (r_hi >> _U32(31)) & _U32(1)
        d = d - neg
        add = r_lo + neg * p
        carry = (add < r_lo).astype(_U32)
        r_lo = add
        r_hi = r_hi + carry  # (r_hi, r_lo) += (0, p): carry propagates the wrap
    for _ in range(2):  # d too low: rem >= p
        big = ((r_hi > _U32(0)) | (r_lo >= p)).astype(_U32)
        d = d + big
        sub_borrow = (r_lo < big * p).astype(_U32)
        r_lo = r_lo - big * p
        r_hi = r_hi - sub_borrow
    return d, r_lo


def _divmod_head_by_p(hi, lo, p):
    """(q_hi, q_lo, r) = divmod(hi*2**32 + lo, p) under the post-renorm
    invariant hi < 2p (so q < 2**33 and q_hi is a single bit).

    Decomposition: q_hi = (hi >= p); the remaining (r1*2**32 + lo) / p has a
    quotient < 2**32, split into two 16-bit digits, each computed by
    `_div_digit` (f32-estimated, exactly corrected — replaces the 32-step
    bit-serial loop whose unrolled graph dominated compile and step time).
    """
    ge = (hi >= p).astype(_U32)
    q_hi = ge
    r1 = hi - ge * p  # < p
    # digit 1: (r1 : lo>>16), a 48-bit value < p*2**16
    d1, rem1 = _div_digit(r1 >> _U32(16), (r1 << _U32(16)) | (lo >> _U32(16)), p)
    # digit 2: (rem1 : lo&0xffff)
    d2, r = _div_digit(rem1 >> _U32(16), (rem1 << _U32(16)) | (lo & _U32(0xFFFF)), p)
    q_lo = (d1 << _U32(16)) | d2
    return q_hi, q_lo, r


def _divmod_head_by_p_bitserial(hi, lo, p):
    """Bit-serial reference for `_divmod_head_by_p` (kept for cross-check
    tests): 32 exact shift-subtract steps on the low word; the partial
    remainder always satisfies r < p < 2**31, so acc = 2r + bit < 2**32."""
    ge = (hi >= p).astype(_U32)
    q_hi = ge
    r = hi - ge * p
    q_lo = jnp.zeros_like(lo)
    for k in range(31, -1, -1):
        bit = (lo >> _U32(k)) & _U32(1)
        acc = (r << _U32(1)) | bit
        take = (acc >= p).astype(_U32)
        r = acc - take * p
        q_lo = (q_lo << _U32(1)) | take
    return q_hi, q_lo, r


def _mul_u32_u32(a, b):
    """Exact 32x32 -> 64 bit multiply via 16-bit limbs; returns (hi, lo)."""
    a0 = a & _U32(0xFFFF)
    a1 = a >> _U32(16)
    b0 = b & _U32(0xFFFF)
    b1 = b >> _U32(16)
    ll = a0 * b0
    mid = a0 * b1 + (ll >> _U32(16))  # <= (2**16-1)**2 + 2**16 - 1 < 2**32
    mid2 = a1 * b0 + (mid & _U32(0xFFFF))
    lo = (mid2 << _U32(16)) | (ll & _U32(0xFFFF))
    hi = a1 * b1 + (mid >> _U32(16)) + (mid2 >> _U32(16))
    return hi, lo


def _push(buf, sp, word, mask):
    """Conditionally push `word` per lane; returns (buf, sp, overflowed)."""
    lanes = jnp.arange(buf.shape[0])
    cap = buf.shape[1]
    idx = jnp.minimum(sp, cap - 1)
    cur = buf[lanes, idx]
    buf = buf.at[lanes, idx].set(jnp.where(mask, word, cur))
    overflowed = mask & (sp >= cap)
    sp = sp + mask.astype(jnp.int32)
    return buf, sp, overflowed


def _pop(buf, sp, mask):
    """Conditionally pop per lane; returns (word, sp, underflowed)."""
    lanes = jnp.arange(buf.shape[0])
    idx = jnp.maximum(sp - 1, 0)
    word = buf[lanes, idx]
    underflowed = mask & (sp <= 0)
    sp = sp - mask.astype(jnp.int32)
    return word, sp, underflowed


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def ans_encode_lanes(state: LaneState, cdf, symbols) -> LaneState:
    """Encode one symbol vector per lane (forward order over seq positions).

    cdf:     (L, seq, support+1) uint32 exclusive cumulative tables
    symbols: (L, seq) int32 in [0, support)

    Equivalent to the reference ANS.encode (mnist_compress.py:49-56) run on
    each lane's stream.
    """
    num_lanes, seq_len, _ = cdf.shape
    lanes = jnp.arange(num_lanes)
    # Pre-gather the (p, c) pair per (lane, position): the scan then carries
    # no table state at all.
    sym = symbols.astype(jnp.int32)
    c_lo = jnp.take_along_axis(cdf, sym[..., None], axis=-1)[..., 0]
    c_hi = jnp.take_along_axis(cdf, sym[..., None] + 1, axis=-1)[..., 0]
    p_seq = c_hi - c_lo  # (L, seq) uint32 frequencies

    def step(carry, xs):
        buf, sp, hi, lo, ovf, unf = carry
        p, c = xs
        # renormalize: x >= p << 33  ⟺  hi >= 2p
        renorm = hi >= (p << _U32(1))
        buf, sp, o = _push(buf, sp, lo, renorm)
        ovf = ovf | o
        lo = jnp.where(renorm, hi, lo)
        hi = jnp.where(renorm, _U32(0), hi)
        # x = (x // p) << 31 | (x % p + c)
        q_hi, q_lo, r = _divmod_head_by_p(hi, lo, p)
        add = r + c  # < 2**31: r < p and c <= 2**31 - p
        new_lo = (q_lo << _U32(31)) + add  # (q_lo & 1) << 31 plus add < 2**31
        new_hi = (q_hi << _U32(31)) | (q_lo >> _U32(1))
        return (buf, sp, new_hi, new_lo, ovf, unf), None

    xs = (jnp.swapaxes(p_seq, 0, 1), jnp.swapaxes(c_lo, 0, 1))
    carry = (state.buf, state.sp, state.hi, state.lo, state.overflow, state.underflow)
    carry, _ = jax.lax.scan(step, carry, xs)
    return LaneState(*carry)


def ans_decode_lanes(state: LaneState, cdf) -> Tuple[LaneState, jnp.ndarray]:
    """Decode one symbol vector per lane (reverse position order internally,
    symbols returned in natural order), mirroring ANS.decode
    (mnist_compress.py:58-68).

    cdf: (L, seq, support+1) uint32
    returns: (state, symbols (L, seq) int32)
    """
    num_lanes, seq_len, supportp1 = cdf.shape
    support = supportp1 - 1

    def step(carry, cdf_row):
        buf, sp, hi, lo, ovf, unf = carry
        masked = lo & _U32(_MASK31)
        # searchsorted-right over the first `support` cdf entries, minus one
        s = (
            jnp.sum((cdf_row[:, :support] <= masked[:, None]).astype(jnp.int32), axis=-1)
            - 1
        )
        lanes = jnp.arange(num_lanes)
        c = cdf_row[lanes, s]
        p = cdf_row[lanes, s + 1] - c
        # x = p * (x >> 31) + masked - c
        t_hi = hi >> _U32(31)  # 0 or 1
        t_lo = (hi << _U32(1)) | (lo >> _U32(31))
        m_hi, m_lo = _mul_u32_u32(p, t_lo)
        m_hi = m_hi + t_hi * p
        delta = masked - c
        new_lo = m_lo + delta
        carry_bit = (new_lo < m_lo).astype(_U32)
        new_hi = m_hi + carry_bit
        # renormalize: x < 2**32  ⟺  hi == 0
        renorm = new_hi == _U32(0)
        word, sp, u = _pop(buf, sp, renorm)
        unf = unf | u
        hi2 = jnp.where(renorm, new_lo, new_hi)
        lo2 = jnp.where(renorm, word, new_lo)
        return (buf, sp, hi2, lo2, ovf, unf), s

    carry = (state.buf, state.sp, state.hi, state.lo, state.overflow, state.underflow)
    carry, syms_rev = jax.lax.scan(step, carry, jnp.swapaxes(cdf, 0, 1), reverse=True)
    # scan(reverse=True) stacks outputs in natural position order already
    symbols = jnp.swapaxes(syms_rev, 0, 1).astype(jnp.int32)
    return LaneState(*carry), symbols
