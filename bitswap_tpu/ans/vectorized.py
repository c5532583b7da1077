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


def pad_lane_state(state: LaneState, num_lanes: int) -> LaneState:
    """Append dummy lanes up to `num_lanes` (for sharding across a mesh that
    does not divide L).  Padding lanes carry a valid fresh head (hi=1, empty
    stack) so they code garbage harmlessly; callers slice results back to the
    real lane count (container.pack_lanes(num_lanes=...))."""
    L = state.num_lanes
    assert num_lanes >= L
    if num_lanes == L:
        return state
    extra = num_lanes - L

    def pad(x, fill):
        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    return LaneState(
        buf=pad(state.buf, np.uint32(0)),
        sp=pad(state.sp, np.int32(0)),
        hi=pad(state.hi, np.uint32(1)),
        lo=pad(state.lo, np.uint32(0)),
        overflow=pad(state.overflow, False),
        underflow=pad(state.underflow, False),
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
# windowed lane ops
#
# Every coder op over a `seq`-symbol vector touches the stream buffer at most
# `seq` times, and pushes/pops within one op are contiguous on each lane's
# stack.  The ops below therefore split into (1) a dense *window* state
# machine over (seq, L) arrays — Pallas TPU kernel or lax.scan, see
# ans/pallas_coder.py — and (2) ONE vectorized buffer append/gather per op,
# instead of the per-symbol scatter/gather of a naive translation.
# ---------------------------------------------------------------------------

from bitswap_tpu.ans import pallas_coder as _pc


def _append_words(state: LaneState, words, mask) -> LaneState:
    """Append the masked window words to each lane's stack (one scatter).

    words, mask: (seq, L) — word/push-flag per symbol position in push order.
    """
    num_lanes, capacity = state.buf.shape
    seq = words.shape[0]
    m = mask.astype(jnp.int32)
    # SCATTER-FREE append.  A scatter into the lane-sharded buffer either
    # forces an all-gather (explicit 2-D lane indices) or lowers to a
    # serialized per-index loop on TPU (batched/vmapped scatter) — both
    # disastrous.  Instead: (1) compact the pushed words to the front of the
    # window with a per-lane binary search over the cumulative push ranks;
    # (2) rebuild the buffer as a masked gather — position c takes
    # compact[c - sp] inside the appended span, else keeps buf[c].  All
    # gathers carry the lane axis as a batch dim, so the op is pure
    # elementwise+gather: fully vectorized on the VPU and partitionable
    # over a lane-sharded mesh.
    ranks = jnp.cumsum(m, axis=0)  # (seq, L); rank j+1 at the j-th push
    npush = ranks[-1]  # (L,)
    ranks_T = jnp.swapaxes(ranks, 0, 1)  # (L, seq)
    words_T = jnp.swapaxes(words, 0, 1)
    j = jnp.arange(seq, dtype=jnp.int32)
    t_of_j = jax.vmap(lambda r: jnp.searchsorted(r, j + 1, side="left"))(ranks_T)
    compact = jnp.take_along_axis(
        words_T, jnp.minimum(t_of_j, seq - 1).astype(jnp.int32), axis=1
    )  # (L, seq): the pushed words in push order (garbage past npush)
    c = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    rel = c - state.sp[:, None]  # (L, capacity)
    in_span = (rel >= 0) & (rel < npush[:, None])  # words past capacity drop
    src = jnp.take_along_axis(compact, jnp.clip(rel, 0, seq - 1), axis=1)
    buf = jnp.where(in_span, src, state.buf)
    overflow = state.overflow | (state.sp + npush > capacity)
    return state._replace(buf=buf, sp=state.sp + npush, overflow=overflow)


def _pop_window(state: LaneState, width: int):
    """(window (width, L) uint32) with window[k, l] = k-th word lane l would
    pop — one gather; reads below the stack bottom are clamped (flagged as
    underflow later via the pop count)."""
    offs = jnp.arange(width, dtype=jnp.int32)
    idx = state.sp[None, :] - 1 - offs[:, None]
    idx = jnp.maximum(idx, 0)
    return jnp.take_along_axis(state.buf, jnp.swapaxes(idx, 0, 1), axis=1).T


def _encode_gather_pc(cdf_ll, symbols_ll):
    """Per-position (p, c) from a lanes-last table (seq, S, L) for symbols
    (seq, L); the implicit final entry cdf[S] = 2**31 supplies c_hi for the
    top symbol."""
    S = cdf_ll.shape[1]
    sym = symbols_ll.astype(jnp.int32)[:, None, :]
    c_lo = jnp.take_along_axis(cdf_ll, sym, axis=1)[:, 0]
    hi_idx = jnp.minimum(sym + 1, S - 1)
    c_hi_in = jnp.take_along_axis(cdf_ll, hi_idx, axis=1)[:, 0]
    c_hi = jnp.where(symbols_ll == S - 1, jnp.uint32(1 << PRECISION_BITS), c_hi_in)
    return c_hi - c_lo, c_lo


def ans_encode_lanes_ll(state: LaneState, cdf_ll, symbols) -> LaneState:
    """Encode one symbol vector per lane from a lanes-last table.

    cdf_ll:  (seq, S, L) uint32 exclusive cumulative table, entries 0..S-1
             (entry S == 2**31 implicit) — ans/tables.build_tables_ll
    symbols: (L, seq) int32 in [0, S)
    """
    symbols_ll = jnp.swapaxes(symbols, 0, 1)
    p, c = _encode_gather_pc(cdf_ll, symbols_ll)
    hi, lo, words, mask = _pc.encode_window(state.hi, state.lo, p, c)
    return _append_words(state._replace(hi=hi, lo=lo), words, mask)


def ans_encode_lanes_shared(state: LaneState, cdf_shared, symbols) -> LaneState:
    """Encode against ONE table row set shared by all lanes (the top-layer
    prior).  cdf_shared: (seq, S) uint32; symbols: (L, seq)."""
    seq, S = cdf_shared.shape
    sym = symbols.astype(jnp.int32)
    c_lo = cdf_shared[jnp.arange(seq)[None, :], sym]
    hi_idx = jnp.minimum(sym + 1, S - 1)
    c_hi_in = cdf_shared[jnp.arange(seq)[None, :], hi_idx]
    c_hi = jnp.where(sym == S - 1, jnp.uint32(1 << PRECISION_BITS), c_hi_in)
    p = jnp.swapaxes(c_hi - c_lo, 0, 1)
    c = jnp.swapaxes(c_lo, 0, 1)
    hi, lo, words, mask = _pc.encode_window(state.hi, state.lo, p, c)
    return _append_words(state._replace(hi=hi, lo=lo), words, mask)


# Decode sub-op chunk length.  The decode kernels select the next pop word
# by a masked one-hot sum over the whole pre-gathered window — O(W) VPU work
# per symbol.  A single window for the full op makes that O(seq^2) per op
# (the round-2 decode gap: at xdim=3072 the scan dominates everything), so
# the drivers below split each op into <=_DECODE_SYM_CHUNK-symbol sub-ops,
# re-gathering a window exactly as wide as the sub-op (pops per sub-op are
# bounded by its symbol count): O(seq * chunk) total, constant VMEM.
_DECODE_SYM_CHUNK = 256


def _decode_lanes_chunked(state: LaneState, seq: int, run):
    """Shared chunked-decode driver.

    run(hi, lo, window, start, n) -> (hi, lo, syms (n, L), npop (L,)) decodes
    positions [start, start+n) (in reverse, as the kernels do).  Chunks are
    processed last-to-first — the op-level pop order — each with a fresh
    window gathered at the current stack pointer."""
    hi, lo = state.hi, state.lo
    sp, under = state.sp, state.underflow
    parts = []
    for start in reversed(range(0, seq, _DECODE_SYM_CHUNK)):
        n = min(_DECODE_SYM_CHUNK, seq - start)
        window = _pop_window(state._replace(sp=sp), n)
        hi, lo, syms, npop = run(hi, lo, window, start, n)
        under = under | (npop > sp)
        sp = sp - npop
        parts.append(syms)
    syms_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts[::-1], axis=0)
    state = state._replace(hi=hi, lo=lo, sp=sp, underflow=under)
    return state, jnp.swapaxes(syms_all, 0, 1)


def ans_decode_lanes_ll(state: LaneState, cdf_ll) -> Tuple[LaneState, jnp.ndarray]:
    """Decode one symbol per position per lane from a lanes-last table
    (seq, S, L).  Returns (state, symbols (L, seq) int32)."""

    def run(hi, lo, window, start, n):
        return _pc.decode_window(hi, lo, cdf_ll[start : start + n], window)

    return _decode_lanes_chunked(state, cdf_ll.shape[0], run)


def ans_decode_lanes_shared(state: LaneState, cdf_shared) -> Tuple[LaneState, jnp.ndarray]:
    """Decode against one lane-shared table (seq, S) uint32 (top prior)."""

    def run(hi, lo, window, start, n):
        return _pc.decode_window_shared(hi, lo, cdf_shared[start : start + n], window)

    return _decode_lanes_chunked(state, cdf_shared.shape[0], run)


# -- table-free (fused affine-CDF) lane ops -----------------------------------


def ans_encode_lanes_affine(state: LaneState, A, B, S: int, kind: str, symbols) -> LaneState:
    """Encode via fused CDF evaluation (ans/fused.py): A, B (seq, L) f32
    sigmoid-argument coefficients, symbols (L, seq) int32 in [0, S)."""
    from bitswap_tpu.ans import fused as _fz

    syms_ll = jnp.swapaxes(symbols.astype(jnp.int32), 0, 1)
    hi, lo, words, mask = _fz.encode_window_affine(state.hi, state.lo, A, B, syms_ll, S, kind)
    return _append_words(state._replace(hi=hi, lo=lo), words, mask)


def ans_decode_lanes_affine(state: LaneState, A, B, S: int, kind: str) -> Tuple[LaneState, jnp.ndarray]:
    """Decode via in-kernel binary search over the fused CDF.  Returns
    (state, symbols (L, seq) int32)."""
    from bitswap_tpu.ans import fused as _fz

    def run(hi, lo, window, start, n):
        return _fz.decode_window_affine(
            hi, lo, A[start : start + n], B[start : start + n], window, S, kind
        )

    return _decode_lanes_chunked(state, A.shape[0], run)


# -- reference-layout wrappers (tests, golden parity) -------------------------


def _ll_from_ref_cdf(cdf):
    """(L, seq, S+1) reference-layout table -> lanes-last (seq, S, L)."""
    return jnp.transpose(cdf[..., :-1], (1, 2, 0))


def ans_encode_lanes(state: LaneState, cdf, symbols) -> LaneState:
    """Reference-layout encode: cdf (L, seq, S+1) uint32, symbols (L, seq).
    Equivalent to the reference ANS.encode (mnist_compress.py:49-56) per
    lane."""
    return ans_encode_lanes_ll(state, _ll_from_ref_cdf(cdf), symbols)


def ans_decode_lanes(state: LaneState, cdf) -> Tuple[LaneState, jnp.ndarray]:
    """Reference-layout decode, mirroring ANS.decode
    (mnist_compress.py:58-68)."""
    return ans_decode_lanes_ll(state, _ll_from_ref_cdf(cdf))
