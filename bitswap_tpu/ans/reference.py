"""Scalar golden-reference rANS coder (host-side, exact big-int arithmetic).

This is the ground truth the vectorized/Pallas coders are tested against.
It reproduces the reference state machine (`class ANS`, mnist_compress.py:
13-68) exactly — 31-bit frequency precision, 32-bit stream words, a head
normalized in [2**32, 2**64), renormalization by pushing/popping 32-bit
words — but takes pre-quantized integer tables (see ans/tables.py) instead
of re-quantizing float pmfs on every call, and holds the state as
(words: list[int<2**32>], head: int<2**64>) rather than the reference's
single Python list whose last element doubles as the head.

Stream equivalence to the reference representation:
    reference_state == words + [head]        (head may occupy up to 64 bits)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from bitswap_tpu.ans.tables import PRECISION_BITS

_MASK31 = (1 << PRECISION_BITS) - 1
_MASK32 = (1 << 32) - 1
_LBOUND = 1 << 32


@dataclass
class RefState:
    """ANS stack state: 32-bit stream words below a <=64-bit head."""

    words: List[int] = field(default_factory=list)
    head: int = 0

    def copy(self) -> "RefState":
        return RefState(words=list(self.words), head=self.head)

    def to_reference_list(self) -> List[int]:
        """The reference's `state` representation (mnist_compress.py:158)."""
        return list(self.words) + [self.head]

    @staticmethod
    def from_reference_list(state: Sequence[int]) -> "RefState":
        return RefState(words=list(state[:-1]), head=int(state[-1]))

    def total_bits(self) -> int:
        return 32 * (len(self.words) + 1) + max(0, self.head.bit_length() - 32)


def fresh_state(seed: int = 100, nwords: int = 10000) -> RefState:
    """Random initial bits exactly as the reference builds them
    (mnist_compress.py:158-159): `nwords` uint32 draws in [2**16, 2**32-1)
    from numpy legacy RandomState(seed), last word shifted up into the head.
    """
    rng = np.random.RandomState(seed)
    words = list(
        map(int, rng.randint(low=1 << 16, high=(1 << 32) - 1, size=nwords, dtype=np.uint32))
    )
    head = words.pop() << 32
    return RefState(words=words, head=head)


class RefANS:
    """Golden coder over integer tables for one vector of symbols.

    pmf: (seq_len, support) uint32/uint64 array, rows sum to 2**31.
    cdf: (seq_len, support + 1) exclusive cumulative rows.
    """

    def __init__(self, pmf: np.ndarray, cdf: np.ndarray):
        assert pmf.ndim == 2 and cdf.shape == (pmf.shape[0], pmf.shape[1] + 1)
        self.pmf = np.asarray(pmf, dtype=np.uint64)
        self.cdf = np.asarray(cdf, dtype=np.uint64)
        assert np.all(self.cdf[:, -1] == (1 << PRECISION_BITS))
        self.seq_len = pmf.shape[0]

    def encode(self, state: RefState, symbols: Sequence[int]) -> RefState:
        """Push symbols [0..seq_len) onto the state, forward order
        (mnist_compress.py:49-56)."""
        x = state.head
        words = state.words
        for i, s in enumerate(symbols):
            p = int(self.pmf[i, s])
            if x >= (p << 33):  # ((lbound >> 31) << 32) * p
                words.append(x & _MASK32)
                x >>= 32
            x = ((x // p) << PRECISION_BITS) + (x % p) + int(self.cdf[i, s])
        state.head = x
        return state

    def decode(self, state: RefState) -> np.ndarray:
        """Pop seq_len symbols (reverse order internally, returned in natural
        order, mnist_compress.py:58-68)."""
        x = state.head
        words = state.words
        out = np.zeros((self.seq_len,), dtype=np.int64)
        for i in reversed(range(self.seq_len)):
            masked = x & _MASK31
            s = int(np.searchsorted(self.cdf[i, :-1], masked, side="right")) - 1
            out[i] = s
            x = int(self.pmf[i, s]) * (x >> PRECISION_BITS) + masked - int(self.cdf[i, s])
            if x < _LBOUND:
                x = (x << 32) | words.pop()
        state.head = x
        return out
