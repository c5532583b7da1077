"""Bit-Swap and BB-ANS codec drivers — fully device-resident, lane-parallel.

Re-design of the reference sender/receiver loops (mnist_compress.py:163-358
and the cifar/imagenet/imagenetcrop/demo copies).  The reference ping-pongs
between GPU (VAE pass) and CPU (per-symbol big-int ANS loop) 2*nz+1 times per
datapoint at batch size 1; here one jitted function per datapoint performs
every VAE pass, CDF table build, and coder scan on device, batched over L
independent stream lanes.  A lane is one ANS stream — one reference
"experiment" (mnist_compress.py:147) or one image's block sequence
(imagenetcrop_compress.py:122-128) — so L images/experiments are coded in
lockstep.

Coding order within a datapoint (Bit-Swap sender, mnist_compress.py:179-205):
  for zi in 0..nz-1:   DECODE z_{zi+1} under q(z_{zi+1}|·)  then
                       ENCODE z_zi (or x) under p(·|z_{zi+1})
  finally              ENCODE z_nz under the Logistic(0,1) prior
BB-ANS instead decodes all layers bottom-up first, then encodes all
(mnist_compress.py:209-243).  The receiver mirrors exactly in reverse.

Symbol order: latents/pixels are flattened in canonical NHWC order; this is
a framework-internal convention (the reference flattens NCHW) — streams are
self-consistent, and the bins tables use the same order.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ans.tables import build_tables_ll
from bitswap_tpu.ans.vectorized import (
    LaneState,
    ans_decode_lanes_affine,
    ans_decode_lanes_ll,
    ans_decode_lanes_shared,
    ans_encode_lanes_affine,
    ans_encode_lanes_ll,
    ans_encode_lanes_shared,
    init_lane_state,
)
from bitswap_tpu.codec.discretize import DiscretizationBins
from bitswap_tpu.models.vae import VAEConfig, generate_apply, infer_apply
from bitswap_tpu.ops.bins import image_bins
from bitswap_tpu.ops.logistic import logistic_cdf


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Static codec parameters (the reference's per-script constants)."""

    model: VAEConfig
    quantbits: int = 10
    bitswap: bool = True  # False -> BB-ANS
    # table evaluation dtype: float64 reproduces the reference's compression
    # mode (mnist_compress.py:77) and is exact on CPU; float32 is the fast
    # TPU-native mode (self-consistent: encoder and decoder build identical
    # tables from identical inputs)
    table_dtype: str = "float32"
    init_words: int = 10000  # mnist_compress.py:158
    capacity: int = 65536  # per-lane stream buffer words
    # symbol flatten order: "nhwc" (framework-native) or "nchw" (the
    # reference's torch flatten, mnist_train.py:321-335) — reference-stream
    # parity mode needs "nchw" + table_dtype="float64" + reference bins
    symbol_order: str = "nhwc"
    # coder backend: "fused" evaluates the quantized CDF pointwise inside the
    # kernels (table-free, binary-search decode — ans/fused.py; needs
    # equal-width bins, which discretize_bins produces); "tables" materializes
    # reference-quantized integer tables (exact reference semantics, required
    # for float64 byte parity).  "auto" = fused for float32, tables for
    # float64.
    coder: str = "auto"

    @property
    def use_fused(self) -> bool:
        if self.coder == "auto":
            return self.table_dtype == "float32"
        assert self.coder in ("fused", "tables"), self.coder
        return self.coder == "fused"

    @property
    def zsupport(self) -> int:
        return 1 << self.quantbits


def _flatten_perm(shape, from_order: str) -> np.ndarray:
    """Row permutation taking per-dimension tables from `from_order` rows to
    the other order's rows: perm[k] = source-order flat index of the k-th
    target-order position.  shape is the NHWC (h, w, c) latent shape."""
    h, w, c = shape
    if from_order == "nhwc":  # target nchw
        return np.arange(h * w * c).reshape(h, w, c).transpose(2, 0, 1).ravel()
    return np.arange(h * w * c).reshape(c, h, w).transpose(1, 2, 0).ravel()


class Codec:
    """Jitted encode/decode closures over (params, bins).

    encode_datapoints(state, xs (T, L, xdim) int32) -> state
    decode_datapoints(state, T) -> (state, xs (T, L, xdim) int32)  [reverse order]
    """

    def __init__(self, params, ccfg: CodecConfig, bins: DiscretizationBins):
        self.ccfg = ccfg
        cfg = ccfg.model
        dt = jnp.dtype(ccfg.table_dtype)
        self._params = params
        assert ccfg.symbol_order in ("nhwc", "nchw"), ccfg.symbol_order

        zend, zcen = np.asarray(bins.zendpoints), np.asarray(bins.zcentres)
        if getattr(bins, "order", "nhwc") != ccfg.symbol_order:
            perm = _flatten_perm(cfg.zshape, getattr(bins, "order", "nhwc"))
            zend, zcen = zend[:, perm], zcen[:, perm]
        self.zendpoints = jnp.asarray(zend, dt)  # (nz, zdim, S-1)
        self.zcentres = jnp.asarray(zcen, dt)  # (nz, zdim, S)

        if ccfg.use_fused:
            # equal-width affine form of the bins: endpoint(j) = e0 + j*w.
            # Layers 0..nz-2 come from uniform discretization
            # (discretize.py's KBinsDiscretizer-uniform equivalent); the top
            # layer's equal-mass prior bins are handled analytically as
            # "logit" kind inside the kernels, so no affine form is needed.
            # All prep stays in numpy — on remote-tunnel backends (axon)
            # every eager device op is a separate compile round trip.
            S = ccfg.zsupport
            ze32 = np.asarray(zend, np.float32)
            w_np = (ze32[..., -1] - ze32[..., 0]) / max(S - 2, 1)  # (nz, zdim)
            # the top layer must actually be the analytic equal-mass
            # Logistic(0,1) bins the kernels assume: e(k) = log(k) - log(S-k)
            # (discretization.py:25-27); a mismatched import would keep round
            # trips exact but silently cost rate
            ks = np.arange(1, S, dtype=np.float64)
            logit_e = np.log(ks) - np.log(S - ks)
            top_dev = np.max(np.abs(ze32[-1] - logit_e[None, :].astype(np.float32)))
            assert top_dev < 1e-4, (
                f"fused coder: top-layer bins deviate from analytic "
                f"Logistic(0,1) equal-mass endpoints by {top_dev}; "
                "use coder='tables' for imported/non-analytic bins"
            )
            if cfg.nz > 1:
                fitted = (
                    ze32[:-1, :, :1]
                    + np.arange(S - 1, dtype=np.float32) * w_np[:-1, :, None]
                )
                dev = np.max(np.abs(fitted - ze32[:-1]))
                span = float(np.median(np.abs(w_np[:-1]))) or 1.0
                # a twentieth of one bin width: loose enough for float32
                # linspace rounding, tight enough to reject non-uniform bins
                assert dev < 5e-2 * span, (
                    f"fused coder needs equal-width bins (max deviation {dev} "
                    f"vs bin width {span}); use coder='tables' instead"
                )
            self._z_e0 = jnp.asarray(ze32[..., 0])  # (nz, zdim)
            self._z_w = jnp.asarray(w_np)
            # pixel bins (rand.py:134-153): e(j) = ((j+1)-127.5)/127.5 - 1/255
            self._x_w = float(1.0 / 127.5)
            self._x_e0 = float((1.0 - 127.5) / 127.5 - 1.0 / 255.0)

        # All remaining static device prep in ONE jitted program (eager ops
        # are prohibitively slow on tunneled backends — one compile instead
        # of ~25): the pixel bins and the static top-prior table — ONE
        # (zdim, S) uint32 row set shared by all lanes, broadcast in-kernel
        # instead of materialized per lane.
        def _static_prep(zend_top):
            xe, xc = image_bins(dtype=dt)
            prior_cdfs = logistic_cdf(
                zend_top, jnp.asarray(0.0, dt), jnp.asarray(1.0, dt)
            )  # (zdim, S-1)
            return xe, xc, build_tables_ll(prior_cdfs[..., None], ccfg.quantbits)[..., 0]

        self.xendpoints, self.xcentres, self.prior_cdf_table = jax.jit(_static_prep)(
            jnp.asarray(zend[cfg.nz - 1], dt)
        )

        self._encode_jit = jax.jit(self._encode_seq)
        self._encode_counts_jit = jax.jit(self._encode_seq_counts)
        self._encode_minsp_jit = jax.jit(self._encode_seq_minsp)
        self._decode_jit = jax.jit(self._decode_seq, static_argnums=(1,))
        self._rest_sp_jit = jax.jit(self._rest_sp)

    # -- table builders ----------------------------------------------------

    def _z_tables(self, zi: int, mu, scale):
        """Lanes-last (zdim, S, L) uint32 cdf tables for latent layer zi
        given the per-lane conditional Logistic params (each (L, zdim)) —
        built directly in the Pallas coder's streaming layout so the large
        table is never transposed."""
        dt = self.zendpoints.dtype
        mu_ll = jnp.swapaxes(mu.astype(dt), 0, 1)[:, None, :]
        scale_ll = jnp.swapaxes(scale.astype(dt), 0, 1)[:, None, :]
        cdfs = logistic_cdf(self.zendpoints[zi][:, :, None], mu_ll, scale_ll)
        return build_tables_ll(cdfs, self.ccfg.quantbits)

    def _x_tables(self, mu, scale):
        """Lanes-last (xdim, 256, L) uint32 cdf tables for the pixel layer
        (quantbits=8, mnist_compress.py:203)."""
        dt = self.xendpoints.dtype
        mu_ll = jnp.swapaxes(mu.astype(dt), 0, 1)[:, None, :]
        scale_ll = jnp.swapaxes(scale.astype(dt), 0, 1)[:, None, :]
        cdfs = logistic_cdf(self.xendpoints[None, :, None], mu_ll, scale_ll)
        return build_tables_ll(cdfs, 8)

    # -- coder op dispatch (fused affine-CDF vs materialized tables) --------

    def _z_kind(self, zi: int) -> str:
        # top layer bins are equal-mass under the Logistic(0,1) prior
        # (discretization.py:25-27) -> analytic logit endpoints
        return "logit" if zi == self.ccfg.model.nz - 1 else "linear"

    def _z_AB(self, zi: int, mu, scale):
        """Sigmoid-argument coefficients for latent layer zi: arg(v) =
        A + B*e(v) with e linear or logit (ans/fused.py).  mu, scale (L,
        zdim) -> A, B (zdim, L) f32 lanes-last."""
        mu = mu.astype(jnp.float32)
        scale = scale.astype(jnp.float32)
        if self._z_kind(zi) == "logit":
            A, B = -mu / scale, 1.0 / scale
        else:
            e0, w = self._z_e0[zi], self._z_w[zi]  # (zdim,)
            A = (e0[None, :] - w[None, :] - mu) / scale
            B = w[None, :] / scale
        return jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1)

    def _x_AB(self, mu, scale):
        mu = mu.astype(jnp.float32)
        scale = scale.astype(jnp.float32)
        A = (self._x_e0 - self._x_w - mu) / scale
        B = self._x_w / scale
        return jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1)

    def _decode_z(self, state, zi, mu, scale):
        if self.ccfg.use_fused:
            A, B = self._z_AB(zi, mu, scale)
            return ans_decode_lanes_affine(state, A, B, self.ccfg.zsupport, self._z_kind(zi))
        return ans_decode_lanes_ll(state, self._z_tables(zi, mu, scale))

    def _encode_z(self, state, zi, mu, scale, sym):
        if self.ccfg.use_fused:
            A, B = self._z_AB(zi, mu, scale)
            return ans_encode_lanes_affine(state, A, B, self.ccfg.zsupport, self._z_kind(zi), sym)
        return ans_encode_lanes_ll(state, self._z_tables(zi, mu, scale), sym)

    def _decode_x(self, state, mu, scale):
        if self.ccfg.use_fused:
            A, B = self._x_AB(mu, scale)
            return ans_decode_lanes_affine(state, A, B, 256, "linear")
        return ans_decode_lanes_ll(state, self._x_tables(mu, scale))

    def _encode_x(self, state, mu, scale, x):
        if self.ccfg.use_fused:
            A, B = self._x_AB(mu, scale)
            return ans_encode_lanes_affine(state, A, B, 256, "linear", x)
        return ans_encode_lanes_ll(state, self._x_tables(mu, scale), x)

    # -- model bridging ----------------------------------------------------

    def _unflatten(self, flat, shape):
        """(L, prod(shape)) symbol-order-flat values -> (L,) + NHWC shape."""
        if self.ccfg.symbol_order == "nhwc":
            return flat.reshape((-1,) + shape)
        h, w, c = shape
        return jnp.transpose(flat.reshape(-1, c, h, w), (0, 2, 3, 1))

    def _flatten(self, img):
        """(L,) + NHWC shape -> (L, dim) in the configured symbol order."""
        if self.ccfg.symbol_order == "nhwc":
            return img.reshape(img.shape[0], -1)
        return jnp.transpose(img, (0, 3, 1, 2)).reshape(img.shape[0], -1)

    def _infer(self, zi: int, given_flat):
        """given_flat: (L, xdim or zdim) bin-centre values; returns flattened
        (mu, scale) each (L, zdim).  The cast mirrors the reference's
        compress-mode float64->float32->float64 bridge (mnist_train.py:
        321-377)."""
        cfg = self.ccfg.model
        given = self._unflatten(
            given_flat.astype(jnp.float32), cfg.xs if zi == 0 else cfg.zshape
        )
        mu, scale = infer_apply(self._params, cfg, zi, given)
        return self._flatten(mu), self._flatten(scale)

    def _generate(self, zi: int, z_flat):
        cfg = self.ccfg.model
        given = self._unflatten(z_flat.astype(jnp.float32), cfg.zshape)
        mu, scale = generate_apply(self._params, cfg, zi, given)
        return self._flatten(mu), self._flatten(scale)

    def _zcentre_lookup(self, zi: int, sym):
        """(L, zdim) bin centres for symbol indices sym (L, zdim)."""
        zdim = sym.shape[1]
        return self.zcentres[zi][jnp.arange(zdim)[None, :], sym]

    # -- single-datapoint sender/receiver -----------------------------------

    def _encode_one(self, state: LaneState, x, min_sp=None):
        """x: (L, xdim) int32 pixels.  Bit-Swap: mnist_compress.py:179-205;
        BB-ANS: :209-243; shared prior encode: :246-251.

        When `min_sp` (L,) int32 is given, it is folded with the stack
        pointer after every decode op — the reference demo's
        `excess_state_len` tracker (demo_compress.py:113-137: the stack only
        shrinks during decodes, so the global minimum occurs at a
        decode-op boundary) — and (state, min_sp) is returned."""
        nz = self.ccfg.model.nz
        num_lanes = x.shape[0]

        def infer_decode(zi, zsym):
            given = self.xcentres[x] if zi == 0 else self._zcentre_lookup(zi - 1, zsym)
            mu, scale = self._infer(zi, given)
            st, sym = self._decode_z(state_ref[0], zi, mu, scale)
            if min_sp_ref[0] is not None:
                min_sp_ref[0] = jnp.minimum(min_sp_ref[0], st.sp)
            return st, sym

        def generate_encode(zi, zsymtop, zsym):
            zc = self._zcentre_lookup(zi, zsymtop)
            mu, scale = self._generate(zi, zc)
            if zi == 0:
                return self._encode_x(state_ref[0], mu, scale, x)
            return self._encode_z(state_ref[0], zi - 1, mu, scale, zsym)

        state_ref = [state]
        min_sp_ref = [min_sp]
        if self.ccfg.bitswap:
            zsym = None
            for zi in range(nz):
                st, zsymtop = infer_decode(zi, zsym)
                state_ref[0] = st
                state_ref[0] = generate_encode(zi, zsymtop, zsym)
                zsym = zsymtop
        else:
            zs: List[jnp.ndarray] = []
            zsym = None
            for zi in range(nz):
                st, zsymtop = infer_decode(zi, zsym)
                state_ref[0] = st
                zs.append(zsymtop)
                zsym = zsymtop
            for zi in range(nz):
                zsymtop = zs[zi]
                prev = x if zi == 0 else zs[zi - 1]
                state_ref[0] = generate_encode(zi, zsymtop, None if zi == 0 else prev)

        # encode the top sample under the (lane-shared) prior
        out = ans_encode_lanes_shared(
            state_ref[0], self.prior_cdf_table, zsym if self.ccfg.bitswap else zs[-1]
        )
        if min_sp is not None:
            return out, min_sp_ref[0]
        return out

    def _decode_one(self, state: LaneState, num_lanes: int) -> Tuple[LaneState, jnp.ndarray]:
        """Receiver for one datapoint (mnist_compress.py:284-354).  Returns
        (state, x (L, xdim) int32)."""
        nz = self.ccfg.model.nz
        state, zsymtop = ans_decode_lanes_shared(state, self.prior_cdf_table)

        if self.ccfg.bitswap:
            for zi in reversed(range(nz)):
                zc = self._zcentre_lookup(zi, zsymtop)
                mu, scale = self._generate(zi, zc)
                if zi == 0:
                    state, sym = self._decode_x(state, mu, scale)
                    given = self.xcentres[sym]
                else:
                    state, sym = self._decode_z(state, zi - 1, mu, scale)
                    given = self._zcentre_lookup(zi - 1, sym)
                mu, scale = self._infer(zi, given)
                state = self._encode_z(state, zi, mu, scale, zsymtop)
                zsymtop = sym
            return state, zsymtop
        else:
            zs = [zsymtop]
            for zi in reversed(range(nz)):
                zc = self._zcentre_lookup(zi, zsymtop)
                mu, scale = self._generate(zi, zc)
                if zi == 0:
                    state, sym = self._decode_x(state, mu, scale)
                else:
                    state, sym = self._decode_z(state, zi - 1, mu, scale)
                zs.append(sym)
                zsymtop = sym
            x = zs[-1]
            # re-encode the latents bottom-up to give the bits back
            # (mnist_compress.py:339-352)
            zsymtop = zs[0]
            for zi in reversed(range(nz)):
                sym = zs[nz - zi]  # z_zi (or x when zi == 0... see below)
                given = self.xcentres[x] if zi == 0 else self._zcentre_lookup(zi - 1, sym)
                mu, scale = self._infer(zi, given)
                state = self._encode_z(state, zi, mu, scale, zsymtop)
                zsymtop = sym
            return state, x

    # -- sequence drivers ----------------------------------------------------

    def _encode_seq(self, state: LaneState, xs):
        """xs: (T, L, xdim) int32 — scan the sender over datapoints."""

        def step(st, x):
            return self._encode_one(st, x), None

        state, _ = jax.lax.scan(step, state, xs)
        return state

    def _encode_seq_counts(self, state: LaneState, xs):
        """Like _encode_seq but also returns the per-datapoint stack pointers
        (T, L) — the experiment harness derives the reference's `nets`/`cma`
        metrics from these (mnist_compress.py:254-260)."""

        def step(st, x):
            st2 = self._encode_one(st, x)
            return st2, st2.sp

        state, sps = jax.lax.scan(step, state, xs)
        return state, sps

    def _encode_seq_minsp(self, state: LaneState, xs):
        """Like _encode_seq but threads the per-lane minimum stack pointer
        reached at any decode-op boundary through the scan — the demo
        codec's initial-bits trim count (demo_compress.py:113-160: words
        below the minimum were never consumed, so they can be dropped from
        the container)."""

        def step(carry, x):
            st, msp = carry
            st2, msp2 = self._encode_one(st, x, min_sp=msp)
            return (st2, msp2), None

        (state, min_sp), _ = jax.lax.scan(step, (state, state.sp), xs)
        return state, min_sp

    def _rest_sp(self, state: LaneState, x):
        """Stack pointer right after the first decode op(s) of the first
        datapoint — the reference's `restbits` snapshot used to discount
        unconsumed initial bits (mnist_compress.py:190-193 Bit-Swap;
        :225-227 BB-ANS takes it after ALL nz decodes)."""
        nz = self.ccfg.model.nz
        given = self.xcentres[x]
        mu, scale = self._infer(0, given)
        st, zsymtop = self._decode_z(state, 0, mu, scale)
        if not self.ccfg.bitswap:
            for zi in range(1, nz):
                given = self._zcentre_lookup(zi - 1, zsymtop)
                mu, scale = self._infer(zi, given)
                st, zsymtop = self._decode_z(st, zi, mu, scale)
        return st.sp

    def _decode_seq(self, state: LaneState, num_datapoints: int):
        num_lanes = state.buf.shape[0]

        def step(st, _):
            st, x = self._decode_one(st, num_lanes)
            return st, x

        state, xs = jax.lax.scan(step, state, None, length=num_datapoints)
        # receiver pops datapoints in reverse encode order (LIFO,
        # mnist_compress.py:278); return them in natural order
        return state, xs[::-1]

    # -- public API ----------------------------------------------------------

    def init_state(self, num_lanes: int, seed: int = 100) -> LaneState:
        return init_lane_state(
            num_lanes,
            capacity=self.ccfg.capacity,
            seed=seed,
            init_words=self.ccfg.init_words,
        )

    def encode_datapoints(self, state: LaneState, xs) -> LaneState:
        """xs: (T, L, xdim) int32."""
        return self._encode_jit(state, xs)

    def encode_datapoints_with_counts(self, state: LaneState, xs):
        """Returns (state, sp_per_datapoint (T, L) int32)."""
        return self._encode_counts_jit(state, xs)

    def encode_datapoints_with_min_sp(self, state: LaneState, xs):
        """Returns (state, min_sp (L,) int32) — min_sp words at the bottom of
        each lane's stack were never consumed and may be trimmed from the
        serialized container (demo_compress.py:160)."""
        return self._encode_minsp_jit(state, xs)

    def rest_sp(self, state: LaneState, x0):
        """The reference's `restbits` stack pointer (see _rest_sp)."""
        return self._rest_sp_jit(state, x0)

    def decode_datapoints(self, state: LaneState, num_datapoints: int):
        return self._decode_jit(state, num_datapoints)


def make_codec(params, ccfg: CodecConfig, bins: DiscretizationBins) -> Codec:
    return Codec(params, ccfg, bins)


def net_words(state: LaneState) -> np.ndarray:
    """Per-lane stream length in 32-bit words, counting the head as the
    reference does (the head is one list element regardless of 33..64-bit
    occupancy: len(state) = words + 1)."""
    return np.asarray(state.sp) + 1
