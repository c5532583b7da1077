"""Bit-Swap and BB-ANS codec drivers — lane-parallel, shared-executable ops.

Re-design of the reference sender/receiver loops (mnist_compress.py:163-358
and the cifar/imagenet/imagenetcrop/demo copies).  The reference ping-pongs
between GPU (VAE pass) and CPU (per-symbol big-int ANS loop) 2*nz+1 times per
datapoint at batch size 1; here every VAE pass, CDF table build, and coder op
runs on device, batched over L independent stream lanes.  A lane is one ANS
stream — one reference "experiment" (mnist_compress.py:147) or one image's
block sequence (imagenetcrop_compress.py:122-128) — so L images/experiments
are coded in lockstep.

Architecture: ONE JITTED EXECUTABLE PER OP KIND, shared verbatim between the
sender and the receiver, driven by a host-side loop.

    Bits-back exactness requires the receiver to rebuild the encoder's CDF
    tables BIT-FOR-BIT: the tables come from f32 conv passes, and XLA
    compiles the "same" f32 graph to different numerics in different
    surrounding programs (fusion/FMA/layout are context-dependent).  A
    monolithic jitted encode scan and a separately-jitted decode scan
    therefore silently diverge — observed on both CPU and TPU with trained
    checkpoints (sharp posteriors hit truncation boundaries).  The only
    construction that GUARANTEES agreement is running the identical compiled
    program in both directions, so every model->tables computation is one
    module-level jitted op, called with the same arguments by the encoder
    and the decoder.  The rANS coder ops are pure uint32 integer programs —
    exact on every backend regardless of compilation context (their one f32
    division estimate is corrected exactly in integer arithmetic,
    ans/vectorized.py) — so their placement is unconstrained.

    Per-op host dispatch costs ~2-5 ms on a tunneled backend; a datapoint is
    4*nz+1 ops over L lanes, so the overhead amortizes over the lane batch
    (the reference pays a host round trip per op at batch size ONE).

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
    # tables with the same shared executable)
    table_dtype: str = "float32"
    init_words: int = 10000  # mnist_compress.py:158
    capacity: int = 65536  # per-lane stream buffer words
    # symbol flatten order: "nhwc" (framework-native) or "nchw" (the
    # reference's torch flatten, mnist_train.py:321-335) — reference-stream
    # parity mode needs "nchw" + table_dtype="float64" + reference bins
    symbol_order: str = "nhwc"
    # model-pass precision: "bfloat16" runs the conv passes on the MXU's
    # native dtype (2x the f32 flops, half the weight traffic).  Exactness
    # is unaffected — the pass is the same shared executable in both
    # directions — only the rate moves (coarser mu/scale vs the f32-built
    # bins; measured ~0.01 b/d on the bench distribution).
    compute_dtype: str = "float32"
    # coder backend: "tables" (default) materializes reference-quantized
    # integer tables with one shared executable per op — the guaranteed-
    # consistent mode (see module docstring).  "fused" evaluates the
    # quantized CDF pointwise inside the coder kernels (table-free,
    # binary-search decode — ans/fused.py): the A/B coefficient prep is a
    # shared executable, but the sigmoid evaluations happen inside the
    # encode and decode kernels themselves — two different programs — so
    # exactness relies on the backend compiling both sigmoids identically.
    # Opt-in until the search-symmetric kernels make that structural.
    coder: str = "auto"

    @property
    def use_fused(self) -> bool:
        if self.coder == "auto":
            return False
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


def _unflatten(flat, shape, order: str):
    """(L, prod(shape)) symbol-order-flat values -> (L,) + NHWC shape."""
    if order == "nhwc":
        return flat.reshape((-1,) + shape)
    h, w, c = shape
    return jnp.transpose(flat.reshape(-1, c, h, w), (0, 2, 3, 1))


def _flatten(img, order: str):
    """(L,) + NHWC shape -> (L, dim) in the configured symbol order."""
    if order == "nhwc":
        return img.reshape(img.shape[0], -1)
    return jnp.transpose(img, (0, 3, 1, 2)).reshape(img.shape[0], -1)


def _centre_gather(centres, sym):
    """(dim, S) value table, (L, dim) symbol indices -> (L, dim) values."""
    return centres[jnp.arange(centres.shape[0])[None, :], sym]


def _model_mu_scale(cfg: VAEConfig, order: str, direction: str, zi: int,
                    params, given_vals, compute_dtype=jnp.float32):
    """The compress-mode model bridge (mnist_train.py:321-377): flat bin-
    centre values in, flattened (mu, scale) out, conv pass in
    `compute_dtype` (float32, or bfloat16 fast mode), results in float32."""
    shape = cfg.xs if (direction == "infer" and zi == 0) else cfg.zshape
    given = _unflatten(given_vals.astype(compute_dtype), shape, order)
    if direction == "infer":
        mu, scale = infer_apply(params, cfg, zi, given)
    else:
        mu, scale = generate_apply(params, cfg, zi, given)
    mu = mu.astype(jnp.float32)
    scale = scale.astype(jnp.float32)
    return _flatten(mu, order), _flatten(scale, order)


# ---------------------------------------------------------------------------
# shared executables
#
# Module-level jitted functions: jax.jit caches by (static args, arg shapes),
# so the encoder and decoder — and multiple Codec instances over the same
# (params, bins), e.g. the Bit-Swap and BB-ANS sweeps of one experiment —
# all hit the same compiled program.  `centres_in` carries the conditioning
# value table (pixel bins at the bottom, z bins above); `endpoints_out`
# carries the output layer's bin endpoints.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _model_op(cfg: VAEConfig, order: str, direction: str, zi: int,
              in_is_x: bool, compute_dtype: str, params, sym, centres_in):
    """Conditioning-value gather + model pass for one coder op.

    sym: (L, dim_in) int32 symbols conditioning the pass; centres_in maps
    them to values ((256,) pixel centres when in_is_x else (dim_in, S)).
    Returns flattened (mu, scale), each (L, dim_out) float32.
    """
    given = centres_in[sym] if in_is_x else _centre_gather(centres_in, sym)
    return _model_mu_scale(cfg, order, direction, zi, params, given,
                           jnp.dtype(compute_dtype))


@functools.partial(jax.jit, static_argnums=(3,))
def _build_tab_op(mu, scale, endpoints_out, quantbits_out: int):
    """Lanes-last integer CDF table build from per-lane Logistic params.

    endpoints_out: (dim_out, S_out - 1) bin endpoints in the table dtype.
    Returns (dim_out, S_out, L) uint32 — build_tables_ll layout."""
    dt = endpoints_out.dtype
    mu_ll = jnp.swapaxes(mu.astype(dt), 0, 1)[:, None, :]
    scale_ll = jnp.swapaxes(scale.astype(dt), 0, 1)[:, None, :]
    cdfs = logistic_cdf(endpoints_out[:, :, None], mu_ll, scale_ll)
    return build_tables_ll(cdfs, quantbits_out)


@functools.partial(jax.jit, static_argnums=(4,))
def _ab_from_op(mu, scale, e0, w, kind: str):
    """Fused-mode analog of _build_tab_op: sigmoid-argument coefficients
    A, B (each (dim_out, L) f32 lanes-last) for arg(v) = A + B*e(v)
    (ans/fused.py).  e0, w: (dim_out,) equal-width bin origin/step (unused
    for kind="logit")."""
    mu = mu.astype(jnp.float32)
    scale = scale.astype(jnp.float32)
    if kind == "logit":
        A, B = -mu / scale, 1.0 / scale
    else:
        A = (e0[None, :] - w[None, :] - mu) / scale
        B = w[None, :] / scale
    return jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1)


# integer coder ops — exact in any program; jitted once per table shape.
# Decode ops fold the running min-stack-pointer in (the demo codec's
# `excess_state_len` tracker, demo_compress.py:113-137: the stack only
# shrinks during decodes, so the global minimum occurs at a decode boundary).


@jax.jit
def _dec_op(state: LaneState, tables, msp):
    state, syms = ans_decode_lanes_ll(state, tables)
    return state, syms, jnp.minimum(msp, state.sp)


@jax.jit
def _enc_op(state: LaneState, tables, syms):
    return ans_encode_lanes_ll(state, tables, syms)


@jax.jit
def _dec_shared_op(state: LaneState, table, msp):
    state, syms = ans_decode_lanes_shared(state, table)
    return state, syms, jnp.minimum(msp, state.sp)


@jax.jit
def _enc_shared_op(state: LaneState, table, syms):
    return ans_encode_lanes_shared(state, table, syms)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _dec_affine_op(state: LaneState, A, B, msp, S: int, kind: str):
    state, syms = ans_decode_lanes_affine(state, A, B, S, kind)
    return state, syms, jnp.minimum(msp, state.sp)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _enc_affine_op(state: LaneState, A, B, syms, S: int, kind: str):
    return ans_encode_lanes_affine(state, A, B, S, kind, syms)


class Codec:
    """Host-driven encode/decode over shared per-op executables.

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
            self._z_e0_rows = [self._z_e0[i] for i in range(cfg.nz)]
            self._z_w_rows = [self._z_w[i] for i in range(cfg.nz)]
            # pixel bins (rand.py:134-153): e(j) = ((j+1)-127.5)/127.5 - 1/255
            xw = 1.0 / 127.5
            xe0 = (1.0 - 127.5) / 127.5 - 1.0 / 255.0
            self._x_e0 = jnp.full((cfg.xdim,), xe0, jnp.float32)
            self._x_w = jnp.full((cfg.xdim,), xw, jnp.float32)

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

        # model-pass weights in the compute dtype (bf16 fast mode halves the
        # weight traffic and doubles MXU throughput); ONE jitted cast
        if ccfg.compute_dtype == "float32":
            self._params_compute = params
        else:
            cdt = jnp.dtype(ccfg.compute_dtype)
            self._params_compute = jax.jit(
                lambda p: jax.tree_util.tree_map(lambda x: x.astype(cdt), p)
            )(params)

        # per-layer rows sliced ONCE: indexing a device array is an eager
        # dispatch (several ms each on a tunneled backend), and the drivers
        # touch these 2-3 times per coder op
        self._zend_rows = [self.zendpoints[i] for i in range(cfg.nz)]
        self._zcen_rows = [self.zcentres[i] for i in range(cfg.nz)]
        self._xend_rows = jnp.broadcast_to(
            self.xendpoints[None, :], (cfg.xdim, self.xendpoints.shape[0])
        ) + jnp.zeros((), dt)  # materialize once (broadcast_to alone is lazy)

    # -- op dispatch ---------------------------------------------------------
    #
    # Every (direction, zi) coder op is one _tab_op (or _ab_op) executable
    # call followed by one integer coder op.  direction="infer" at zi
    # produces the q(z_{zi+1}|·) tables (decode on the sender, encode on the
    # receiver); direction="generate" at zi produces the p(z_{zi-1}|z_zi) —
    # or p(x|z_1) at zi=0 — tables.

    def _op_kinds(self, direction: str, zi: int):
        """(in_is_x, centres_in, endpoints_out, quantbits_out, fused kind,
        e0, w) for one op."""
        cfg = self.ccfg.model
        if direction == "infer":
            in_is_x = zi == 0
            centres_in = self.xcentres if in_is_x else self._zcen_rows[zi - 1]
            endpoints_out = self._zend_rows[zi]
            qb_out = self.ccfg.quantbits
            kind = "logit" if zi == cfg.nz - 1 else "linear"
            e0 = self._z_e0_rows[zi] if self.ccfg.use_fused else None
            w = self._z_w_rows[zi] if self.ccfg.use_fused else None
        else:
            in_is_x = False
            centres_in = self._zcen_rows[zi]
            if zi == 0:
                endpoints_out = self._xend_rows
                qb_out = 8
                kind = "linear"
                e0 = self._x_e0 if self.ccfg.use_fused else None
                w = self._x_w if self.ccfg.use_fused else None
            else:
                endpoints_out = self._zend_rows[zi - 1]
                qb_out = self.ccfg.quantbits
                kind = "logit" if zi - 1 == cfg.nz - 1 else "linear"
                e0 = self._z_e0_rows[zi - 1] if self.ccfg.use_fused else None
                w = self._z_w_rows[zi - 1] if self.ccfg.use_fused else None
        return in_is_x, centres_in, endpoints_out, qb_out, kind, e0, w

    def _mu_scale(self, direction: str, zi: int, sym_in):
        """The model bridge for one coder op — overridable injection point
        (tests replay recorded reference (mu, scale) feeds through here)."""
        in_is_x, cin, _, _, _, _, _ = self._op_kinds(direction, zi)
        return _model_op(self.ccfg.model, self.ccfg.symbol_order, direction,
                         zi, in_is_x, self.ccfg.compute_dtype,
                         self._params_compute, sym_in, cin)

    def _dec(self, state, direction, zi, sym_in, msp):
        """Decode one symbol vector under the (direction, zi) model op."""
        _, _, eout, qb, kind, e0, w = self._op_kinds(direction, zi)
        mu, scale = self._mu_scale(direction, zi, sym_in)
        if self.ccfg.use_fused:
            A, B = _ab_from_op(mu, scale, e0, w, kind)
            S = 256 if (direction == "generate" and zi == 0) else self.ccfg.zsupport
            return _dec_affine_op(state, A, B, msp, S, kind)
        return _dec_op(state, _build_tab_op(mu, scale, eout, qb), msp)

    def _enc(self, state, direction, zi, sym_in, syms):
        """Encode `syms` under the (direction, zi) model op."""
        _, _, eout, qb, kind, e0, w = self._op_kinds(direction, zi)
        mu, scale = self._mu_scale(direction, zi, sym_in)
        if self.ccfg.use_fused:
            A, B = _ab_from_op(mu, scale, e0, w, kind)
            S = 256 if (direction == "generate" and zi == 0) else self.ccfg.zsupport
            return _enc_affine_op(state, A, B, syms, S, kind)
        return _enc_op(state, _build_tab_op(mu, scale, eout, qb), syms)

    # -- single-datapoint sender/receiver -----------------------------------

    def _encode_one(self, state: LaneState, x, msp):
        """x: (L, xdim) int32 pixels.  Bit-Swap: mnist_compress.py:179-205;
        BB-ANS: :209-243; shared prior encode: :246-251.  Threads the
        min-stack-pointer through every decode op."""
        nz = self.ccfg.model.nz
        if self.ccfg.bitswap:
            zsym = None
            for zi in range(nz):
                given = x if zi == 0 else zsym
                state, zsymtop, msp = self._dec(state, "infer", zi, given, msp)
                syms = x if zi == 0 else zsym
                state = self._enc(state, "generate", zi, zsymtop, syms)
                zsym = zsymtop
            state = _enc_shared_op(state, self.prior_cdf_table, zsym)
        else:
            zs: List[jnp.ndarray] = []
            prev = x
            for zi in range(nz):
                state, zsymtop, msp = self._dec(state, "infer", zi, prev, msp)
                zs.append(zsymtop)
                prev = zsymtop
            for zi in range(nz):
                syms = x if zi == 0 else zs[zi - 1]
                state = self._enc(state, "generate", zi, zs[zi], syms)
            state = _enc_shared_op(state, self.prior_cdf_table, zs[-1])
        return state, msp

    def _decode_one(self, state: LaneState, msp) -> Tuple[LaneState, jnp.ndarray, jnp.ndarray]:
        """Receiver for one datapoint (mnist_compress.py:284-354).  Returns
        (state, x (L, xdim) int32, msp)."""
        nz = self.ccfg.model.nz
        state, zsymtop, msp = _dec_shared_op(state, self.prior_cdf_table, msp)

        if self.ccfg.bitswap:
            for zi in reversed(range(nz)):
                state, sym, msp = self._dec(state, "generate", zi, zsymtop, msp)
                state = self._enc(state, "infer", zi, sym, zsymtop)
                zsymtop = sym
            return state, zsymtop, msp
        else:
            zs = [zsymtop]
            for zi in reversed(range(nz)):
                state, sym, msp = self._dec(state, "generate", zi, zsymtop, msp)
                zs.append(sym)
                zsymtop = sym
            x = zs[-1]
            # re-encode the latents bottom-up to give the bits back
            # (mnist_compress.py:339-352)
            zsymtop = zs[0]
            for zi in reversed(range(nz)):
                sym = zs[nz - zi]  # z_{zi-1}, or x when zi == 0
                given = x if zi == 0 else sym
                state = self._enc(state, "infer", zi, given, zsymtop)
                zsymtop = sym
            return state, x, msp

    # -- public API ----------------------------------------------------------

    def replicate_aux(self, mesh) -> "Codec":
        """Replicate the codec's bin/table constants over `mesh`.

        The host-loop drivers pass these as ARGUMENTS to the shared ops; when
        the lane state and params are committed to a multi-device mesh, every
        co-argument must be committed compatibly (replicated), or jit rejects
        the mixed device sets.  Call once after `make_codec` when running on
        a mesh (parallel/mesh.py callers)."""
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def put(x):
            return jax.device_put(x, rep)

        for name in ("zendpoints", "zcentres", "xendpoints", "xcentres",
                     "prior_cdf_table", "_xend_rows"):
            setattr(self, name, put(getattr(self, name)))
        self._zend_rows = [put(x) for x in self._zend_rows]
        self._zcen_rows = [put(x) for x in self._zcen_rows]
        same = self._params_compute is self._params
        self._params = jax.tree_util.tree_map(put, self._params)
        self._params_compute = (
            self._params if same else jax.tree_util.tree_map(put, self._params_compute)
        )
        if self.ccfg.use_fused:
            self._z_e0, self._z_w = put(self._z_e0), put(self._z_w)
            self._z_e0_rows = [put(x) for x in self._z_e0_rows]
            self._z_w_rows = [put(x) for x in self._z_w_rows]
            self._x_e0, self._x_w = put(self._x_e0), put(self._x_w)
        return self

    def init_state(self, num_lanes: int, seed: int = 100) -> LaneState:
        return init_lane_state(
            num_lanes,
            capacity=self.ccfg.capacity,
            seed=seed,
            init_words=self.ccfg.init_words,
        )

    def encode_datapoints(self, state: LaneState, xs) -> LaneState:
        """xs: (T, L, xdim) int32."""
        msp = state.sp
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
        return state

    def encode_datapoints_with_counts(self, state: LaneState, xs):
        """Returns (state, sp_per_datapoint (T, L) int32) — the experiment
        harness derives the reference's `nets`/`cma` metrics from these
        (mnist_compress.py:254-260)."""
        msp = state.sp
        sps = []
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
            sps.append(state.sp)
        return state, jnp.stack(sps)

    def encode_datapoints_with_min_sp(self, state: LaneState, xs):
        """Returns (state, min_sp (L,) int32) — min_sp words at the bottom of
        each lane's stack were never consumed and may be trimmed from the
        serialized container (demo_compress.py:160)."""
        msp = state.sp
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
        return state, msp

    def rest_sp(self, state: LaneState, x0):
        """Stack pointer right after the first decode op(s) of the first
        datapoint — the reference's `restbits` snapshot used to discount
        unconsumed initial bits (mnist_compress.py:190-193 Bit-Swap;
        :225-227 BB-ANS takes it after ALL nz decodes)."""
        nz = self.ccfg.model.nz
        msp = state.sp
        st, zsymtop, msp = self._dec(state, "infer", 0, jnp.asarray(x0), msp)
        if not self.ccfg.bitswap:
            for zi in range(1, nz):
                st, zsymtop, msp = self._dec(st, "infer", zi, zsymtop, msp)
        return st.sp

    def decode_datapoints(self, state: LaneState, num_datapoints: int):
        """Returns (state, xs (T, L, xdim) int32) in natural (encode) order —
        the receiver pops datapoints LIFO (mnist_compress.py:278)."""
        msp = state.sp
        xs = []
        for _ in range(num_datapoints):
            state, x, msp = self._decode_one(state, msp)
            xs.append(x)
        return state, jnp.stack(xs[::-1])


def make_codec(params, ccfg: CodecConfig, bins: DiscretizationBins) -> Codec:
    return Codec(params, ccfg, bins)


def net_words(state: LaneState) -> np.ndarray:
    """Per-lane stream length in 32-bit words, counting the head as the
    reference does (the head is one list element regardless of 33..64-bit
    occupancy: len(state) = words + 1)."""
    return np.asarray(state.sp) + 1
