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
    does not divide L).  Padding lanes carry a random valid head and a stack
    of random words (>= 2**16, like initial bits) at the REAL lanes' minimum
    depth — not sp=0, which would blow the lane spread past the windowed
    buffer ops' _SPREAD_CAP (the ops only touch a lane-uniform window around
    the stack tops).  They code/pop words harmlessly; callers slice results
    back to the real lane count (container.pack_lanes(num_lanes=...))."""
    L = state.num_lanes
    assert num_lanes >= L
    if num_lanes == L:
        return state
    extra = num_lanes - L
    capacity = state.capacity
    sp_host = np.asarray(state.sp)
    pad_sp = int(sp_host.min()) if sp_host.size else 0

    # Padding stacks must look like REAL streams: random words >= 2**16,
    # like init_lane_state's initial bits.  A zero-filled stack is
    # pathological under decode — every popped 0-word leaves the head below
    # lbound, forcing another pop, so a padding lane burns through its whole
    # stack in a few ops and drags the lane-uniform buffer window
    # (_SPREAD_CAP) away from the real lanes.
    rng = np.random.RandomState(977)
    pad_buf = np.zeros((extra, capacity), np.uint32)
    if pad_sp > 0:
        pad_buf[:, :pad_sp] = rng.randint(
            1 << 16, (1 << 32) - 1, size=(extra, pad_sp), dtype=np.uint32)
    pad_hi = rng.randint(1 << 16, (1 << 32) - 1, size=(extra,), dtype=np.uint32)

    def pad(x, tail):
        return jnp.concatenate([x, jnp.asarray(tail)], axis=0)

    return LaneState(
        buf=pad(state.buf, pad_buf),
        sp=pad(state.sp, np.full((extra,), pad_sp, np.int32)),
        hi=pad(state.hi, pad_hi),
        lo=pad(state.lo, np.zeros((extra,), np.uint32)),
        overflow=pad(state.overflow, np.zeros((extra,), bool)),
        underflow=pad(state.underflow, np.zeros((extra,), bool)),
    )


@jax.jit
def lane_states_equal(a: LaneState, b: LaneState):
    """Per-lane exact-equality (L,) bool of two LaneStates, ON DEVICE.

    Equality in the reference-list sense (same stack contents + same head):
    buffer words above the stack pointer are don't-care.  Use this instead
    of comparing `lane_state_to_ref_lists` results when the buffers are
    large — a device->host fetch of the full (L, capacity) buffer costs
    minutes on tunneled backends; this fetches L booleans."""
    assert a.capacity == b.capacity, (a.capacity, b.capacity)
    sp_eq = a.sp == b.sp
    head_eq = (a.hi == b.hi) & (a.lo == b.lo)
    live = jnp.arange(a.capacity, dtype=jnp.int32)[None, :] < jnp.minimum(a.sp, b.sp)[:, None]
    buf_eq = jnp.all(jnp.where(live, a.buf == b.buf, True), axis=1)
    return sp_eq & head_eq & buf_eq


@jax.jit
def arrays_equal(a, b):
    """Scalar bool, on device — one 1-byte fetch instead of shipping both
    arrays to the host.  Shapes must match EXACTLY (trace-time check):
    broadcastable mismatches (e.g. (T, 1, xdim) vs (T, L, xdim)) must fail,
    not silently compare under broadcasting."""
    assert a.shape == b.shape, f"shape mismatch: {a.shape} vs {b.shape}"
    return jnp.all(a == b)


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


# Maximum supported spread between the deepest and shallowest lane stack
# (max sp - min sp).  The buffer ops below touch only a lane-uniform window
# of `seq + _SPREAD_CAP` columns around the stack tops — per-lane-offset
# indexing over the full (L, capacity) buffer is a general gather, which the
# TPU serializes per element (measured ~19 ns/element: 111 ms per append at
# L=256/capacity=22528, 100x the coder kernel).  Lanes run the same op
# sequence on same-sized data, so their stack depths stay within a few
# hundred words of each other; exceeding the cap sets the sticky overflow
# flag (loud failure, never silent corruption).  Kept small deliberately:
# on bandwidth-starved backends every extra window column is HBM traffic.
# Override with BITSWAP_TPU_SPREAD_CAP for workloads whose lanes drift
# further apart (more datapoints per stream -> wider random walk).
import os as _os

_SPREAD_CAP = int(_os.environ.get("BITSWAP_TPU_SPREAD_CAP", "2048"))


def _lane_shift_right(x, d, fill):
    """Per-lane right shift: out[l, j] = x[l, j - d[l]] (fill for j < d[l]).

    A barrel shifter: log2(W) static-roll stages selected per lane by the
    bits of d — pure slice/concat/where, fully vectorized on TPU (a per-lane
    dynamic shift is otherwise a serialized gather).  d must be in [0, W]."""
    L, W = x.shape
    fill = x.dtype.type(fill) if hasattr(x.dtype, "type") else fill
    for b in range((W - 1).bit_length()):
        amt = 1 << b
        if amt >= W:
            shifted = jnp.full_like(x, fill)
        else:
            pad = jnp.full((L, amt), fill, x.dtype)
            shifted = jnp.concatenate([pad, x[:, :-amt]], axis=1)
        take = ((d >> b) & 1) == 1
        x = jnp.where(take[:, None], shifted, x)
    return x


def _append_words(state: LaneState, words, mask) -> LaneState:
    """Append the masked window words to each lane's stack.

    words, mask: (seq, L) — word/push-flag per symbol position in push order.

    GATHER- AND SCATTER-FREE: general gathers/scatters serialize per element
    on TPU.  (1) compact the pushed words to the front with ONE stable 1-bit
    sort (pushed-first, push order preserved); (2) barrel-shift each lane's
    compacted run right by its stack offset inside a lane-uniform window;
    (3) merge the window back with a single dynamic_slice / where /
    dynamic_update_slice (lane-uniform starts — contiguous, fast)."""
    num_lanes, capacity = state.buf.shape
    seq = words.shape[0]
    m = mask.astype(jnp.int32)
    npush = jnp.sum(m, axis=0, dtype=jnp.int32)  # (L,) (int32 also under x64)

    # (1) stable sort by the 1-bit "not pushed" key: pushed words first, in
    # original (= push) order
    keys_T = jnp.swapaxes(1 - m, 0, 1)  # (L, seq) int32
    words_T = jnp.swapaxes(words, 0, 1)
    _, compact = jax.lax.sort((keys_T, words_T), dimension=1, is_stable=True,
                              num_keys=1)  # (L, seq)

    # (2) lane-uniform window [base, base + Wb) covering every lane's span
    Wb = min(seq + _SPREAD_CAP, capacity)
    base = jnp.clip(jnp.min(state.sp), 0, capacity - Wb).astype(jnp.int32)
    d = state.sp - base  # (L,) per-lane offset inside the window
    fits = d + npush <= Wb  # spread cap / clamp check, per lane
    pad = jnp.zeros((num_lanes, Wb - seq), words.dtype) if Wb > seq else None
    patch = compact[:, :Wb] if Wb <= seq else jnp.concatenate([compact, pad], axis=1)
    patch = _lane_shift_right(patch, jnp.minimum(d, Wb), np.uint32(0))

    # (3) merge
    k = jnp.arange(Wb, dtype=jnp.int32)[None, :]
    in_span = (k >= d[:, None]) & (k < (d + npush)[:, None]) & fits[:, None]
    window = jax.lax.dynamic_slice(state.buf, (jnp.int32(0), base), (num_lanes, Wb))
    merged = jnp.where(in_span, patch, window)
    buf = jax.lax.dynamic_update_slice(state.buf, merged, (jnp.int32(0), base))
    overflow = state.overflow | (state.sp + npush > capacity) | ~fits
    return state._replace(buf=buf, sp=state.sp + npush, overflow=overflow)


def _pop_window(state: LaneState, width: int):
    """(window (width, L) uint32, bad (L,) bool) with window[k, l] = k-th
    word lane l would pop.  Same lane-uniform dynamic_slice + barrel-shift
    construction as _append_words (general gathers serialize on TPU); reads
    below the stack bottom yield zeros (flagged as underflow later via the
    pop count).  `bad` marks lanes whose stack top lies outside the window —
    spread over _SPREAD_CAP — whose values would be silently wrong; callers
    fold it into the sticky underflow flag."""
    num_lanes, capacity = state.buf.shape
    Wb = min(width + _SPREAD_CAP, capacity)
    base = jnp.clip(jnp.min(state.sp) - width, 0, capacity - Wb).astype(jnp.int32)
    window = jax.lax.dynamic_slice(state.buf, (jnp.int32(0), base), (num_lanes, Wb))
    # align so lane l's top word (buf[l, sp-1]) lands at column Wb-1:
    # aligned[l, j] = window[l, j - (Wb - (sp[l]-base))]
    bad = (state.sp - base) > Wb
    d = jnp.clip(Wb - (state.sp - base), 0, Wb)
    aligned = _lane_shift_right(window, d, np.uint32(0))
    return aligned[:, ::-1][:, :width].T, bad  # (width, L), (L,)


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
_DECODE_SYM_CHUNK = 1024


def _decode_sym_chunk(num_lanes: int) -> int:
    """Per-L decode sub-op chunk: the Pallas decode kernels keep the whole
    word window (W=chunk, R, 128) u32 block VMEM-resident, so once the lane
    rows R = ceil(L/128) grow, W must shrink to keep W*R*512B inside the
    16MB scoped limit.  W*R <= 16*1024 caps the window at 8MB (proven at
    R<=16, i.e. L<=2048, with W=1024); at R=32 (L=4096) a 1024-symbol
    window ALONE is 16MB — the entire scoped budget (measured OOM,
    mnist_probe r5)."""
    R = -(-num_lanes // 128)
    return max(128, min(_DECODE_SYM_CHUNK, (16 * 1024) // max(R, 1)))


def _decode_lanes_chunked(state: LaneState, seq: int, run):
    """Shared chunked-decode driver.

    run(hi, lo, window, start, n) -> (hi, lo, syms (n, L), npop (L,)) decodes
    positions [start, start+n) (in reverse, as the kernels do).  Chunks are
    processed last-to-first — the op-level pop order — each with a fresh
    window gathered at the current stack pointer."""
    hi, lo = state.hi, state.lo
    sp, under = state.sp, state.underflow
    chunk = _decode_sym_chunk(state.num_lanes)
    parts = []
    for start in reversed(range(0, seq, chunk)):
        n = min(chunk, seq - start)
        window, bad = _pop_window(state._replace(sp=sp), n)
        hi, lo, syms, npop = run(hi, lo, window, start, n)
        under = under | (npop > sp) | bad
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
