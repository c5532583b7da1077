"""Integer pmf/CDF table construction for the rANS coder.

The coder consumes *integer* tables: per-dimension pmf rows summing exactly to
2**PRECISION_BITS and zero-padded cumulative rows.  The quantization semantics
replicate the reference `ANS.__init__` (mnist_compress.py:29-47) exactly:

    multiplier = 2**31 - 2**quantbits
    pmf_int    = trunc(pmf_float * multiplier)        # truncation, not round
    pmf_int   += 1                                     # no zero-frequency bins
    pmf_int[argmax(pmf_int)] += 2**31 - sum(pmf_int)   # dump remainder

All entries then lie in [1, 2**31) and every cumulative row ends at exactly
2**31 — so both pmf and cdf fit in uint32, which is what the TPU lane coder
uses (TPU has no native 64-bit integers; see ans/vectorized.py).

Two entry points:
- `quantize_pmfs(pmf_float)`: quantize already-materialized float pmfs.
- `build_tables_from_cdf(endpoint_cdfs)`: fuse the pmf construction the codec
  drivers do by hand (diff of CDFs at bin endpoints + the two open tail bins,
  mnist_compress.py:183-185) with the quantization — one jit-fusable op, no
  host round-trip, no (support+2)-wide float intermediate in HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PRECISION_BITS = 31  # reference `ansbits` (mnist_compress.py:76)
TOTAL_MASS = 1 << PRECISION_BITS


class AnsTables(NamedTuple):
    """Integer coder tables for a batch of symbol rows.

    pmf: (..., seq_len, support) uint32 — frequencies, sum == 2**31 per row.
    cdf: (..., seq_len, support + 1) uint32 — exclusive cumulative, cdf[...,0]
         == 0 and cdf[..., -1] == 2**31.
    """

    pmf: jnp.ndarray
    cdf: jnp.ndarray

    @property
    def support(self) -> int:
        return self.pmf.shape[-1]


def _quantize_axis(pmf_float, quantbits: int, axis: int):
    """The reference ANS.__init__ quantization (mnist_compress.py:29-36)
    along `axis` — the ONE copy of this exactness-critical code, shared by
    both table layouts.

    - Clamp: in float32 table mode a CDF difference can round to a tiny
      negative value, which must not wrap when cast to uint32.  (The f64
      path never hits this; the reference ran f64 throughout.)
    - trunc matches torch .long() (round toward zero; pmfs non-negative).
    - Remainder to the (first) argmax bin; argmax of the post-+1 integers,
      as in the reference.  The subtraction wraps mod 2**32 when float
      rounding makes the row sum overshoot 2**31; adding the wrapped value
      to the argmax bin is exact two's-complement arithmetic and the true
      result is always non-negative (the argmax bin dwarfs |remainder|).
    """
    multiplier = float((1 << PRECISION_BITS) - (1 << quantbits))
    pmf_float = jnp.maximum(pmf_float, 0.0)
    pmf = jnp.trunc(pmf_float * multiplier).astype(jnp.uint32) + jnp.uint32(1)
    remainder = (
        jnp.uint32(TOTAL_MASS) - jnp.sum(pmf, axis=axis, keepdims=True)
    ).astype(jnp.uint32)
    amax = jnp.argmax(pmf, axis=axis, keepdims=True)
    support = pmf.shape[axis]
    iota = jax.lax.broadcasted_iota(jnp.int32, pmf.shape, pmf.ndim + axis if axis < 0 else axis)
    onehot = (iota == amax.astype(jnp.int32)).astype(jnp.uint32)
    return pmf + onehot * remainder


def quantize_pmfs(pmf_float, quantbits: int) -> AnsTables:
    """Quantize float pmf rows to integer frequency + cumulative tables.

    pmf_float: (..., seq_len, support) float array of per-dimension bin
    masses (need not be exactly normalized — the reference's aren't either,
    since they come from CDF differences with clamped tails).
    """
    pmf = _quantize_axis(pmf_float, quantbits, axis=-1)
    cdf = _exclusive_cumsum(pmf)
    return AnsTables(pmf=pmf, cdf=cdf)


def build_tables_ll(endpoint_cdfs, quantbits: int):
    """Lanes-last table build for the Pallas coder (ans/pallas_coder.py).

    endpoint_cdfs: (seq, support - 1, L) float CDF evaluations at interior
    bin endpoints, with the lane axis LAST (the layout the TPU kernels
    stream, so the large table is built in place and never transposed).
    Returns the exclusive cumulative table (seq, support, L) uint32 WITHOUT
    the final row — entry `support` is always 2**31 and is implicit.

    Quantization semantics are identical to `quantize_pmfs` (reference
    ANS.__init__, mnist_compress.py:29-47), applied along axis -2 by the
    same shared `_quantize_axis`.
    """
    left = endpoint_cdfs[..., :1, :]
    right = 1.0 - endpoint_cdfs[..., -1:, :]
    mid = endpoint_cdfs[..., 1:, :] - endpoint_cdfs[..., :-1, :]
    pmf_float = jnp.concatenate([left, mid, right], axis=-2)
    pmf = _quantize_axis(pmf_float, quantbits, axis=-2)
    # exclusive cumsum, final (always-2**31) row dropped
    cum = jnp.cumsum(pmf, axis=-2, dtype=jnp.uint32)
    zero = jnp.zeros(pmf.shape[:-2] + (1,) + pmf.shape[-1:], dtype=jnp.uint32)
    return jnp.concatenate([zero, cum[..., :-1, :]], axis=-2)


def build_tables_from_cdf(endpoint_cdfs, quantbits: int) -> AnsTables:
    """Build tables from CDF values at the support's interior bin endpoints.

    endpoint_cdfs: (..., seq_len, support - 1) float CDF evaluations at the
    interior endpoints (the codec evaluates logistic_cdf at `zendpoints` /
    `xendpoints`).  The pmf is the CDF difference with the two open tail bins
    cdf[0] and 1 - cdf[-1] prepended/appended (mnist_compress.py:184-185).
    """
    left = endpoint_cdfs[..., :1]
    right = 1.0 - endpoint_cdfs[..., -1:]
    mid = endpoint_cdfs[..., 1:] - endpoint_cdfs[..., :-1]
    pmf_float = jnp.concatenate([left, mid, right], axis=-1)
    return quantize_pmfs(pmf_float, quantbits)


def _exclusive_cumsum(pmf_u32):
    """Zero-padded cumulative sum in uint32 (exact: total mass is 2**31)."""
    cum = jnp.cumsum(pmf_u32.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    zero = jnp.zeros(pmf_u32.shape[:-1] + (1,), dtype=jnp.uint32)
    return jnp.concatenate([zero, cum], axis=-1)
