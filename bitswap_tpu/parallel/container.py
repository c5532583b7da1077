"""Multi-lane stream container: deterministic variable-length lane gather.

The single-stream demo container (codec/demo.py, mirroring the reference's
demo_compress.py:273-284) holds ONE word stack + head.  Pod-scale encoding
shards L independent lanes across devices/hosts (parallel/mesh.py), and each
lane's stack depth is data-dependent — so persisting a sharded run needs a
deterministic gather of L variable-length streams into one flat buffer whose
bytes do not depend on the mesh shape.

Layout (flat uint32, little-endian fields):

    [ MAGIC, VERSION, L, meta_len,
      meta[meta_len],
      nwords[L],                      # per-lane stack depth after trimming
      lane 0: words..., head_lo, head_hi,
      lane 1: words..., head_lo, head_hi,
      ... ]

Lane order is the caller's global block order (lane l of the LaneState is
always global stream l, regardless of which device held it), so containers
written from a 1-device and an N-device run of the same data are
byte-identical — asserted by tests/test_container.py.

Gather scope: `np.asarray` on the sharded LaneState collects across the
*local* devices of one process (multi-chip, single-host).  Under a
multi-process (pod) run, `pack_lanes` first performs a
`multihost_utils.process_allgather` of every LaneState field, so every host
returns the identical container bytes; writing it from rank 0 only is the
caller's choice (the reference analog is Horovod's rank-0-only
serialization, mnist_train.py:895-899).

Cross-mesh portability: the container BYTES are mesh-agnostic, but bits-back
DECODING additionally requires the receiver to rebuild the encoder's CDF
tables bit-for-bit (codec/bitswap.py docstring).  That is structural when
the decode-side codec runs the same fat-op executables — same lane count and
mesh shape — and numerically robust (reference-f64-class, not structural)
for `table_dtype="float64"` on a different mesh, because jit compiles a
different program per sharding layout.  Decode f32 streams on a mesh of the
encoding shape; use f64 tables when resharding (__graft_entry__.py
dryrun (3) exercises exactly that split).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from bitswap_tpu.ans.vectorized import LaneState, lane_state_from_ref_lists

MAGIC = np.uint32(0x42535450)  # "BSTP"
VERSION = np.uint32(1)


def _host_local(state: LaneState) -> LaneState:
    """Make every LaneState field fully host-addressable.

    Single-process (even multi-device): a no-op — np.asarray collects local
    shards.  Multi-process: allgather every field so each host holds the
    full lane axis (SURVEY §5 distributed backend; the reference gathers to
    rank 0 via Horovod, mnist_train.py:895-899).  Fails loudly if the
    distributed runtime cannot gather.

    The multi-process branch is EXECUTED (not just written) by
    tests/test_container.py::TestMultiProcessGather: two jax.distributed
    CPU processes shard the lane axis and both return byte-identical
    containers equal to a single-process run's bytes."""
    import jax

    if jax.process_count() == 1:
        return state
    try:
        from jax.experimental import multihost_utils

        return LaneState(*(
            multihost_utils.process_allgather(f, tiled=True) for f in state
        ))
    except Exception as e:  # pragma: no cover - needs a real multi-host run
        raise RuntimeError(
            "pack_lanes: multi-process gather failed; gather the LaneState "
            "to every host (multihost_utils.process_allgather) before "
            f"packing: {e}"
        ) from e


def pack_lanes(
    state: LaneState,
    trim: Optional[np.ndarray] = None,
    meta: Sequence[int] = (),
    num_lanes: Optional[int] = None,
) -> np.ndarray:
    """Serialize a (possibly mesh-sharded) LaneState into one uint32 buffer.

    trim: optional (L,) int — per-lane count of leading initializer words
    never consumed during coding (the demo codec's `excess_state_len`,
    demo_compress.py:113-160); they are omitted from the container.
    meta: caller-defined uint32 words (e.g. [T, nblocks, h, w]) returned
    verbatim by `unpack_lanes`.
    num_lanes: real lane count when the state was padded for an uneven
    mesh split (mesh.shard_lane_state); padding lanes are dropped.
    """
    state = _host_local(state)
    # device_get gathers across local devices in lane order — the single
    # deterministic host-side collection point
    buf = np.asarray(state.buf)
    sp = np.asarray(state.sp).astype(np.int64)
    hi = np.asarray(state.hi).astype(np.uint64)
    lo = np.asarray(state.lo).astype(np.uint64)
    L = num_lanes if num_lanes is not None else buf.shape[0]
    assert L <= buf.shape[0]
    buf, sp, hi, lo = buf[:L], sp[:L], hi[:L], lo[:L]
    assert not np.any(np.asarray(state.overflow)[:L]), "cannot pack overflowed lanes"
    t = np.zeros(L, np.int64) if trim is None else np.asarray(trim).astype(np.int64)
    assert t.shape == (L,) and np.all(t >= 0) and np.all(t <= sp)

    nwords = (sp - t).astype(np.uint32)
    meta_arr = np.asarray(list(meta), dtype=np.uint32)
    header = np.asarray([MAGIC, VERSION, L, meta_arr.size], dtype=np.uint32)
    parts = [header, meta_arr, nwords]
    for l in range(L):
        parts.append(buf[l, t[l] : sp[l]].astype(np.uint32))
        parts.append(np.asarray([lo[l] & 0xFFFFFFFF, hi[l] & 0xFFFFFFFF], np.uint32))
    return np.concatenate(parts)


def unpack_lanes(arr: np.ndarray, capacity: Optional[int] = None
                 ) -> Tuple[LaneState, np.ndarray]:
    """Inverse of pack_lanes -> (LaneState, meta uint32 array).

    The LaneState is rebuilt host-side (replicated / unsharded); callers
    reshard it onto whatever mesh the decode runs on
    (parallel.mesh.shard_lane_state) — the container is mesh-agnostic.

    capacity=None sizes the buffer to the deepest packed lane plus slack:
    decoding replays the encode sp-trajectory in reverse, so the stack never
    grows beyond its packed depth.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint32 or arr.ndim != 1 or arr.size < 4:
        raise ValueError("not a lane container (need a flat uint32 array)")
    if arr[0] != MAGIC:
        raise ValueError(f"bad magic {arr[0]:#x}")
    if arr[1] != VERSION:
        raise ValueError(f"unsupported container version {arr[1]}")
    L = int(arr[2])
    meta_len = int(arr[3])
    off = 4
    meta = arr[off : off + meta_len].copy()
    off += meta_len
    if off + L > arr.size:
        raise ValueError(f"container truncated: nwords table needs {off + L} "
                         f"words, have {arr.size}")
    nwords = arr[off : off + L].astype(np.int64)
    off += L
    # validate the full payload length up front so a truncated or corrupted
    # container fails with ValueError, not an out-of-bounds read
    need = off + int(nwords.sum()) + 2 * L
    if need > arr.size:
        raise ValueError(f"container truncated: need {need} words, have {arr.size}")
    lanes = []
    for l in range(L):
        n = int(nwords[l])
        words = arr[off : off + n]
        head_lo, head_hi = int(arr[off + n]), int(arr[off + n + 1])
        off += n + 2
        lanes.append(list(map(int, words)) + [(head_hi << 32) | head_lo])
    if off != arr.size:
        raise ValueError(f"container size mismatch: consumed {off} of {arr.size}")
    if capacity is None:
        capacity = int(nwords.max()) + 64 if L else 64
    return lane_state_from_ref_lists(lanes, capacity=capacity), meta
