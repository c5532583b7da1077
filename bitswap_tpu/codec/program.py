"""Single-program codec: the whole Bit-Swap/BB-ANS coding loop as ONE
compiled executable, shared verbatim by the sender and the receiver.

The fat-op architecture (codec/bitswap.py) guarantees bits-back exactness by
making every (direction, zi) coder op one executable called by both sides —
but it dispatches 2*nz+1 programs per datapoint.  On a tunneled TPU backend
each program execution carries a fixed ~25-45 ms launch latency (measured:
a k5 conv, a k3 conv at 1/3 the flops, and a same-flops matmul all cost the
same ~23 ms wall), so a host-driven op loop is latency-bound no matter how
fast the kernels are.  This module removes the host from the loop entirely:

    ONE jitted program  =  lax.scan over an OP-DESCRIPTOR STREAM
                           whose body lax.switch-es over 2*nz+3 op kinds

    op kinds: INFER(zi), GEN(zi)      model pass -> CDF -> cond(enc, dec)
              PRIOR                   static-table coder op
              LOADX, STOREX           move a datapoint between the x buffer
                                      and the symbol registers

The descriptor stream (op code, datapoint index, encode/decode flag per op)
is RUNTIME DATA: the sender and the receiver call the *same compiled
executable* with different descriptor arrays.  Each model branch therefore
exists exactly once in the compiled program — the sender's q(z_i|·) tables
and the receiver's are produced by literally the same machine code, which is
the bits-back exactness requirement (codec/bitswap.py module docstring).
Both schemes (Bit-Swap and BB-ANS) and both directions are pure descriptor
data over the same program.

Symbol registers: slots 0..nz of an (nz+1, L, maxdim) int32 array, one per
variable in the hierarchy (slot 0 = x, slot i = z_i).  Every op's slot usage
is static: INFER(zi) conditions on slot zi and codes slot zi+1; GEN(zi)
conditions on slot zi+1 and codes slot zi; PRIOR codes slot nz.  All four
reference loops (Bit-Swap/BB-ANS sender mnist_compress.py:179-251, receiver
:277-358) are realized purely by op order under this one convention.

The per-op stack-pointer trace (n_ops, L) returned by the program supplies
every metric the experiment harness needs — the reference's `restbits`
snapshot (mnist_compress.py:190-193), per-datapoint net bits (:254-260), and
the demo codec's `excess_state_len` min-pointer (demo_compress.py:113-137)
— without any extra device round trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans.vectorized import (
    LaneState,
    ans_decode_lanes_affine,
    ans_decode_lanes_ll,
    ans_decode_lanes_shared,
    ans_encode_lanes_affine,
    ans_encode_lanes_ll,
    ans_encode_lanes_shared,
)


class ProgramConsts(NamedTuple):
    """Device-resident constants threaded into the program (bins + tables).

    zcen: (nz, zdim, S) value table; xcentres: (256,).  Fused mode uses the
    equal-width coefficients (z_e0, z_w, x_e0, x_w); tables mode uses the
    endpoint rows (zend (nz, zdim, S-1), xend (xdim, 255)).  prior_table:
    (zdim, S) uint32 — the static top-prior integer table."""

    xcentres: jnp.ndarray
    zcen: jnp.ndarray
    prior_table: jnp.ndarray
    z_e0: jnp.ndarray  # (nz, zdim)   fused mode; zeros in tables mode
    z_w: jnp.ndarray
    x_e0: jnp.ndarray  # (xdim,)
    x_w: jnp.ndarray
    zend: jnp.ndarray  # (nz, zdim, S-1)  tables mode; zeros(...,1) in fused
    xend: jnp.ndarray  # (xdim, 255)


def build_op_stream(nz: int, bitswap: bool, direction: str, T: int):
    """(op_code, dp_idx, is_enc) numpy descriptor arrays for T datapoints.

    Op codes: 0..nz-1 = INFER(zi); nz..2nz-1 = GEN(zi); 2nz = PRIOR;
    2nz+1 = LOADX; 2nz+2 = STOREX.  Sender and receiver streams have the
    same length T*(2nz+2), so both directions share one compiled program.
    """
    INFER, GEN = lambda z: z, lambda z: nz + z
    PRIOR, LOADX, STOREX = 2 * nz, 2 * nz + 1, 2 * nz + 2
    ops = []  # (code, dp, is_enc)
    if direction == "encode":
        for t in range(T):
            ops.append((LOADX, t, False))
            if bitswap:  # mnist_compress.py:179-205
                for zi in range(nz):
                    ops.append((INFER(zi), t, False))
                    ops.append((GEN(zi), t, True))
            else:  # BB-ANS, mnist_compress.py:209-243
                for zi in range(nz):
                    ops.append((INFER(zi), t, False))
                for zi in range(nz):
                    ops.append((GEN(zi), t, True))
            ops.append((PRIOR, t, True))
    else:  # receiver pops datapoints LIFO (mnist_compress.py:278)
        for t in reversed(range(T)):
            ops.append((PRIOR, t, False))
            if bitswap:  # mnist_compress.py:296-317
                for zi in reversed(range(nz)):
                    ops.append((GEN(zi), t, False))
                    ops.append((INFER(zi), t, True))
            else:  # mnist_compress.py:322-352
                for zi in reversed(range(nz)):
                    ops.append((GEN(zi), t, False))
                for zi in reversed(range(nz)):
                    ops.append((INFER(zi), t, True))
            ops.append((STOREX, t, False))
    arr = np.asarray(ops, dtype=np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2].astype(bool)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def run_program(cfg, order: str, compute_dtype: str, use_fused: bool,
                quantbits: int, coder_noop: bool, params, consts: ProgramConsts,
                state: LaneState, xs_buf, msp, op_code, dp_idx, is_enc):
    """Execute one descriptor stream.  xs_buf: (T, L, xdim) int32 — the data
    on encode, zeros on decode (STOREX fills it).  Returns
    (state, xs_buf, msp, sp_trace (n_ops, L) int32).

    coder_noop=True is the PHASE-TIMING INSTRUMENT (bench.py): every coder
    op (the cond(enc, dec) rANS steps, incl. the prior op) is replaced by an
    identity that passes `syms_enc` through and folds a checksum of the CDF
    data into msp (so the model passes and table/coefficient builds cannot
    be dead-code-eliminated).  The resulting state is NOT a valid stream —
    only its wall time is meaningful: it measures the model share of the
    same compiled-scan regime the real codec runs in, which a per-op
    dispatch loop cannot (each standalone dispatch pays ~23 ms launch +
    uncached weight traffic; VERDICT r4 weak #2)."""
    from bitswap_tpu.codec.bitswap import _ab_from, _build_tab, _centre_gather, _model_mu_scale

    nz, zdim, xdim = cfg.nz, cfg.zdim, cfg.xdim
    S = 1 << quantbits
    maxdim = max(xdim, zdim)
    L = state.num_lanes
    cdt = jnp.dtype(compute_dtype)

    def coder_step(state, msp, is_enc_t, syms_enc, fused_args, tab, kind, S_out):
        """cond(enc, dec) on prepared CDF data; returns (state, syms, msp)."""
        if coder_noop:
            # timing no-op: keep the CDF data live via a checksum folded
            # into msp (min with a value >= 2**30, so msp is numerically
            # undisturbed in practice yet data-dependent for the compiler)
            if use_fused:
                A, B = fused_args
                chk = (jnp.sum(A) + jnp.sum(B)).astype(jnp.int32)
            else:
                chk = jnp.sum(tab).astype(jnp.int32)
            dep = jnp.maximum(jnp.abs(chk), jnp.int32(1 << 30))
            return state, syms_enc, jnp.minimum(msp, dep)
        if use_fused:
            A, B = fused_args

            def enc(st, m):
                return ans_encode_lanes_affine(st, A, B, S_out, kind, syms_enc), syms_enc, m

            def dec(st, m):
                st2, sy = ans_decode_lanes_affine(st, A, B, S_out, kind)
                return st2, sy, jnp.minimum(m, st2.sp)

        else:
            def enc(st, m):
                return ans_encode_lanes_ll(st, tab, syms_enc), syms_enc, m

            def dec(st, m):
                st2, sy = ans_decode_lanes_ll(st, tab)
                return st2, sy, jnp.minimum(m, st2.sp)

        return jax.lax.cond(is_enc_t, enc, dec, state, msp)

    def model_coder(carry, is_enc_t, direction, zi, slot_in, slot_out,
                    dim_in, dim_out, qb_out, kind, in_is_x):
        state, regs, msp, xs_buf = carry
        sym_in = regs[slot_in][:, :dim_in]
        if in_is_x:
            given = consts.xcentres[sym_in]
        else:
            # conditioning z values always come from the *input* slot's layer
            # bins: slot_in = zi for infer(zi>0) -> layer zi-1; slot_in =
            # zi+1 for generate(zi) -> layer zi
            layer = slot_in - 1
            given = _centre_gather(consts.zcen[layer], sym_in)
        mu, scale = _model_mu_scale(cfg, order, direction, zi, params, given, cdt)
        fused_args = tab = None
        if use_fused:
            if dim_out == xdim and direction == "generate" and zi == 0:
                e0, w = consts.x_e0, consts.x_w
            else:
                e0, w = consts.z_e0[slot_out - 1], consts.z_w[slot_out - 1]
            fused_args = _ab_from(mu, scale, e0, w, kind)
        else:
            eout = consts.xend if (direction == "generate" and zi == 0) else consts.zend[slot_out - 1]
            tab = _build_tab(mu, scale, eout, qb_out)
        state, syms, msp = coder_step(state, msp, is_enc_t, regs[slot_out][:, :dim_out],
                                      fused_args, tab, kind, 1 << qb_out)
        regs = regs.at[slot_out, :, :dim_out].set(syms)
        return (state, regs, msp, xs_buf)

    def make_infer(zi):
        def br(carry, dp, is_enc_t):
            return model_coder(
                carry, is_enc_t, "infer", zi, slot_in=zi, slot_out=zi + 1,
                dim_in=xdim if zi == 0 else zdim, dim_out=zdim,
                qb_out=quantbits, kind="logit" if zi == nz - 1 else "linear",
                in_is_x=(zi == 0),
            )
        return br

    def make_gen(zi):
        def br(carry, dp, is_enc_t):
            return model_coder(
                carry, is_enc_t, "generate", zi, slot_in=zi + 1, slot_out=zi,
                dim_in=zdim, dim_out=xdim if zi == 0 else zdim,
                qb_out=8 if zi == 0 else quantbits,
                kind="linear" if zi == 0 else ("logit" if zi - 1 == nz - 1 else "linear"),
                in_is_x=False,
            )
        return br

    def prior_br(carry, dp, is_enc_t):
        state, regs, msp, xs_buf = carry
        syms_enc = regs[nz][:, :zdim]

        if coder_noop:  # static-table op: no model pass to keep live
            return (state, regs, msp, xs_buf)

        def enc(st, m):
            return ans_encode_lanes_shared(st, consts.prior_table, syms_enc), syms_enc, m

        def dec(st, m):
            st2, sy = ans_decode_lanes_shared(st, consts.prior_table)
            return st2, sy, jnp.minimum(m, st2.sp)

        state, syms, msp = jax.lax.cond(is_enc_t, enc, dec, state, msp)
        regs = regs.at[nz, :, :zdim].set(syms)
        return (state, regs, msp, xs_buf)

    def loadx_br(carry, dp, is_enc_t):
        state, regs, msp, xs_buf = carry
        x = jax.lax.dynamic_index_in_dim(xs_buf, dp, 0, keepdims=False)
        regs = regs.at[0, :, :xdim].set(x)
        return (state, regs, msp, xs_buf)

    def storex_br(carry, dp, is_enc_t):
        state, regs, msp, xs_buf = carry
        xs_buf = jax.lax.dynamic_update_slice_in_dim(
            xs_buf, regs[0][:, :xdim][None], dp, 0)
        return (state, regs, msp, xs_buf)

    branches = ([make_infer(zi) for zi in range(nz)]
                + [make_gen(zi) for zi in range(nz)]
                + [prior_br, loadx_br, storex_br])

    def body(carry, op):
        code, dp, enc_t = op
        carry = jax.lax.switch(code, branches, carry, dp, enc_t)
        return carry, carry[0].sp

    regs0 = jnp.zeros((nz + 1, L, maxdim), jnp.int32)
    carry0 = (state, regs0, msp, xs_buf)
    (state, _, msp, xs_buf), sp_trace = jax.lax.scan(
        body, carry0, (op_code, dp_idx, is_enc))
    return state, xs_buf, msp, sp_trace
