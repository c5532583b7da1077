"""Bit-Swap and BB-ANS codec drivers — lane-parallel, shared-executable ops.

Re-design of the reference sender/receiver loops (mnist_compress.py:163-358
and the cifar/imagenet/imagenetcrop/demo copies).  The reference ping-pongs
between GPU (VAE pass) and CPU (per-symbol big-int ANS loop) 2*nz+1 times per
datapoint at batch size 1; here every VAE pass, CDF table build, and coder op
runs on device, batched over L independent stream lanes.  A lane is one ANS
stream — one reference "experiment" (mnist_compress.py:147) or one image's
block sequence (imagenetcrop_compress.py:122-128) — so L images/experiments
are coded in lockstep.

Architecture (two dispatch tiers, same exactness construction):

- DEFAULT: the whole coding loop as ONE compiled program (codec/program.py)
  — a lax.scan over a runtime op-descriptor stream; encode, decode and both
  schemes are descriptor DATA over the same executable (zero host round
  trips; mandatory on high-launch-latency backends).
- FALLBACK ("dispatch='ops'", and automatically under test model-feed
  injection): ONE JITTED EXECUTABLE PER MODEL KIND ("fat op"), shared
  verbatim between the sender and the receiver, driven by a host-side loop.

    Bits-back exactness requires the receiver to rebuild the encoder's CDF
    tables BIT-FOR-BIT: the tables come from f32 conv passes, and XLA
    compiles the "same" f32 graph to different numerics in different
    surrounding programs (fusion/FMA/layout are context-dependent).  A
    monolithic jitted encode scan and a separately-jitted decode scan
    therefore silently diverge — observed on both CPU and TPU with trained
    checkpoints (sharp posteriors hit truncation boundaries).  The only
    construction that GUARANTEES agreement is running the identical compiled
    program in both directions.  Each (direction, zi) coder op is therefore
    ONE module-level jitted "fat op" containing

        model pass -> table / CDF-coefficient build        (shared upstream)
        lax.cond(is_encode, encode coder op, decode coder op)

    The sender and the receiver call the *same compiled executable* with
    only the `is_encode` flag (runtime data) differing: the model pass and
    the table quantization — all the context-sensitive f32 work — execute as
    literally the same machine code in both directions.  The rANS coder ops
    inside the cond branches are pure uint32 integer programs — exact on
    every backend regardless of compilation context (their one f32 division
    estimate is corrected exactly in integer arithmetic, ans/vectorized.py).
    In fused mode the coder kernels additionally evaluate the quantized CDF
    pointwise (elementwise f32 sigmoid); elementwise chains have no
    reductions and their one contractible site is FMA-pinned
    (ans/fused.py:_nofma), so those evaluations agree across the two kernel
    bodies as well.

    One dispatch per coder op (2*nz+1 per datapoint) instead of the three
    (model / table / coder) of the previous per-stage split; stream buffers
    are donated so the lane stacks update in place.

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
    # coder backend: "fused" (the float32 default) evaluates the quantized
    # CDF pointwise inside the coder kernels (table-free, binary-search
    # decode — ans/fused.py); "tables" materializes reference-quantized
    # integer tables (required for reference byte parity / float64).  Both
    # run under the fat-op construction (module docstring): everything
    # upstream of the integer coder — model pass, table quantization, A/B
    # coefficients — is one executable shared by sender and receiver, and
    # the fused kernels' in-kernel CDF evaluations are FMA-pinned
    # (ans/fused.py:_nofma) so the encode and decode kernels agree.
    coder: str = "auto"
    # op dispatch: "auto" runs the whole coding loop as ONE compiled program
    # (codec/program.py — the device-resident fast path, mandatory on
    # high-launch-latency backends); "ops" forces the per-op fat-op loop
    # (used automatically when a test subclass injects _mu_scale).
    dispatch: str = "auto"

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


def _build_tab(mu, scale, endpoints_out, quantbits_out: int):
    """Lanes-last integer CDF table build from per-lane Logistic params.

    endpoints_out: (dim_out, S_out - 1) bin endpoints in the table dtype.
    Returns (dim_out, S_out, L) uint32 — build_tables_ll layout."""
    dt = endpoints_out.dtype
    mu_ll = jnp.swapaxes(mu.astype(dt), 0, 1)[:, None, :]
    scale_ll = jnp.swapaxes(scale.astype(dt), 0, 1)[:, None, :]
    cdfs = logistic_cdf(endpoints_out[:, :, None], mu_ll, scale_ll)
    return build_tables_ll(cdfs, quantbits_out)


_build_tab_op = functools.partial(jax.jit, static_argnums=(3,))(_build_tab)


def _ab_from(mu, scale, e0, w, kind: str):
    """Fused-mode analog of _build_tab: sigmoid-argument coefficients
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


_ab_from_op = functools.partial(jax.jit, static_argnums=(4,))(_ab_from)


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


def _dec_shared_impl(state: LaneState, table, msp):
    state, syms = ans_decode_lanes_shared(state, table)
    return state, syms, jnp.minimum(msp, state.sp)


def _enc_shared_impl(state: LaneState, table, syms):
    return ans_encode_lanes_shared(state, table, syms)


_dec_shared_op = jax.jit(_dec_shared_impl)
_enc_shared_op = jax.jit(_enc_shared_impl)
# donating variants for the fat-op drivers: the lane stacks update in place
_dec_shared_op_d = jax.jit(_dec_shared_impl, donate_argnums=(0,))
_enc_shared_op_d = jax.jit(_enc_shared_impl, donate_argnums=(0,))


@functools.cache
def _donate() -> bool:
    """In-place stream-buffer donation on real TPU backends only.  CPU
    ignores donation (with a warning per executable); the tunneled "axon"
    backend executes donated programs but then WEDGES every subsequent
    device->host transfer in the process (measured: any np.asarray after one
    donated execution blocks forever), so donation is disabled there.
    Donation never changes results, only buffer reuse."""
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


# defensive copy of a caller's LaneState before entering a donating op chain,
# and a fresh min-stack-pointer buffer (never an alias of state.sp: the fat
# op donates every leaf of `state`, and a donated buffer must not also ride
# in as a second argument).  The same copy op DETACHES driver outputs: a
# buffer aliased to a donated input must never escape to the host — fetching
# one deadlocks on the tunneled (axon) backend — so every public driver
# returns freshly-copied leaves.
_copy_state_op = jax.jit(lambda st: jax.tree_util.tree_map(jnp.copy, st))
_msp0_op = jax.jit(lambda sp: sp + jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _dec_affine_op(state: LaneState, A, B, msp, S: int, kind: str):
    state, syms = ans_decode_lanes_affine(state, A, B, S, kind)
    return state, syms, jnp.minimum(msp, state.sp)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _enc_affine_op(state: LaneState, A, B, syms, S: int, kind: str):
    return ans_encode_lanes_affine(state, A, B, S, kind, syms)


# ---------------------------------------------------------------------------
# the fat op: model pass + table/coefficient build + flag-selected coder step,
# one executable per (direction, zi) — THE hot-path dispatch unit (see module
# docstring).  The stream buffers are donated: each lane stack is updated in
# place instead of copied per op.
# ---------------------------------------------------------------------------


def _fat_op_impl(cfg: VAEConfig, order: str, direction: str, zi: int, in_is_x: bool,
            compute_dtype: str, use_fused: bool, kind: str, qb_out: int,
            params, sym_in, centres_in, state: LaneState, syms_enc, msp, aux,
            is_encode):
    """One coder op end-to-end.

    sym_in: (L, dim_in) int32 conditioning symbols; centres_in maps them to
    values.  syms_enc: (L, dim_out) int32 — the symbols to encode (any value,
    e.g. zeros, on decode calls).  aux: fused mode (e0, w) equal-width bin
    coefficients, tables mode the (dim_out, S-1) endpoint rows.  is_encode:
    traced bool scalar — the ONLY thing distinguishing a sender call from the
    mirroring receiver call, so both run this same compiled program and the
    model->tables computation cannot diverge between them.

    Returns (state, syms_out, msp): decode yields the decoded symbols and the
    folded min-stack-pointer; encode passes syms_enc/msp through unchanged.
    """
    given = centres_in[sym_in] if in_is_x else _centre_gather(centres_in, sym_in)
    mu, scale = _model_mu_scale(cfg, order, direction, zi, params, given,
                                jnp.dtype(compute_dtype))
    if use_fused:
        e0, w = aux
        A, B = _ab_from(mu, scale, e0, w, kind)
        S = 1 << qb_out

        def enc(st, msp_in):
            st2 = ans_encode_lanes_affine(st, A, B, S, kind, syms_enc)
            return st2, syms_enc, msp_in

        def dec(st, msp_in):
            st2, syms = ans_decode_lanes_affine(st, A, B, S, kind)
            return st2, syms, jnp.minimum(msp_in, st2.sp)

    else:
        tab = _build_tab(mu, scale, aux, qb_out)

        def enc(st, msp_in):
            return ans_encode_lanes_ll(st, tab, syms_enc), syms_enc, msp_in

        def dec(st, msp_in):
            st2, syms = ans_decode_lanes_ll(st, tab)
            return st2, syms, jnp.minimum(msp_in, st2.sp)

    return jax.lax.cond(is_encode, enc, dec, state, msp)


_FAT_STATICS = (0, 1, 2, 3, 4, 5, 6, 7, 8)
_fat_op = jax.jit(_fat_op_impl, static_argnums=_FAT_STATICS, donate_argnums=(12,))
_fat_op_nd = jax.jit(_fat_op_impl, static_argnums=_FAT_STATICS)


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
            # structural guard (once per process): the fused kernels'
            # encode/decode agreement is an empirical Mosaic property —
            # verify it on THIS backend before trusting any fused stream
            # (ans/fused.py:fused_self_check)
            from bitswap_tpu.ans.fused import fused_self_check

            fused_self_check()
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

        # fat-op routing: active unless a subclass overrides _mu_scale (the
        # test-injection hook replays recorded (mu, scale) feeds, which the
        # single-executable fat op cannot intercept)
        self._fat = type(self)._mu_scale is Codec._mu_scale
        self._enc_flag = jnp.asarray(True)
        self._dec_flag = jnp.asarray(False)
        self._dummy_syms = {}
        self._op_streams = {}
        self._prog_consts_cache = None

    # -- fat-op plumbing -----------------------------------------------------

    def _dummy(self, state: LaneState, dim: int):
        """Zero symbols (L, dim) int32 for the unused `syms_enc` argument of
        decode-direction fat-op calls, cached per shape and matched to the
        lane sharding of `state` so sender and receiver calls hit the same
        compiled program."""
        key = (state.num_lanes, dim, getattr(state.sp, "sharding", None))
        d = self._dummy_syms.get(key)
        if d is None:
            z = np.zeros((state.num_lanes, dim), np.int32)
            sh = getattr(state.sp, "sharding", None)
            spec = getattr(sh, "spec", None)
            if spec is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                lanes_axis = tuple(spec)[0] if len(tuple(spec)) else None
                d = jax.device_put(
                    z, NamedSharding(sh.mesh, PartitionSpec(lanes_axis, None))
                )
            else:
                d = jnp.asarray(z)
            self._dummy_syms[key] = d
        return d

    def _dummy_sp(self, state: LaneState):
        """Cached (L,) int32 zeros for the unused `msp` argument of
        encode-direction fat-op calls (must not alias the donated state.sp)."""
        key = ("sp", state.num_lanes, getattr(state.sp, "sharding", None))
        d = self._dummy_syms.get(key)
        if d is None:
            z = np.zeros((state.num_lanes,), np.int32)
            sh = getattr(state.sp, "sharding", None)
            d = jnp.asarray(z) if getattr(sh, "spec", None) is None else jax.device_put(z, sh)
            self._dummy_syms[key] = d
        return d

    def _fat_call(self, state, direction, zi, sym_in, syms, msp, is_encode):
        """Dispatch one fat op (see _fat_op); syms=None on decode calls."""
        in_is_x, cin, eout, qb, kind, e0, w = self._op_kinds(direction, zi)
        aux = (e0, w) if self.ccfg.use_fused else eout
        if syms is None:
            syms = self._dummy(state, eout.shape[0])
        op = _fat_op if _donate() else _fat_op_nd
        return op(
            self.ccfg.model, self.ccfg.symbol_order, direction, zi, in_is_x,
            self.ccfg.compute_dtype, self.ccfg.use_fused, kind, qb,
            self._params_compute, sym_in, cin, state, syms, msp,
            aux, self._enc_flag if is_encode else self._dec_flag,
        )

    # -- single-program dispatch (codec/program.py) --------------------------

    @property
    def _use_program(self) -> bool:
        return self._fat and self.ccfg.dispatch != "ops"

    def _prog_consts(self):
        from bitswap_tpu.codec.program import ProgramConsts

        if self._prog_consts_cache is None:
            if self.ccfg.use_fused:
                zero = jnp.zeros((1, 1, 1), self.zendpoints.dtype)
                self._prog_consts_cache = ProgramConsts(
                    xcentres=self.xcentres, zcen=self.zcentres,
                    prior_table=self.prior_cdf_table,
                    z_e0=self._z_e0, z_w=self._z_w,
                    x_e0=self._x_e0, x_w=self._x_w,
                    zend=zero, xend=zero[0],
                )
            else:
                zero = jnp.zeros((1,), jnp.float32)
                self._prog_consts_cache = ProgramConsts(
                    xcentres=self.xcentres, zcen=self.zcentres,
                    prior_table=self.prior_cdf_table,
                    z_e0=zero, z_w=zero, x_e0=zero, x_w=zero,
                    zend=self.zendpoints, xend=self._xend_rows,
                )
        return self._prog_consts_cache

    def _prog_call(self, state: LaneState, xs_buf, direction: str, T: int,
                   coder_noop: bool = False):
        """Run the whole coding loop as one program.  Returns
        (state, xs_buf, msp, sp_trace (n_ops, L))."""
        from bitswap_tpu.codec.program import build_op_stream, run_program

        key = (direction, T, self.ccfg.bitswap)
        ops = self._op_streams.get(key)
        if ops is None:
            ops = tuple(jnp.asarray(a) for a in build_op_stream(
                self.ccfg.model.nz, self.ccfg.bitswap, direction, T))
            self._op_streams[key] = ops
        return run_program(
            self.ccfg.model, self.ccfg.symbol_order, self.ccfg.compute_dtype,
            self.ccfg.use_fused, self.ccfg.quantbits, coder_noop,
            self._params_compute, self._prog_consts(), state, xs_buf,
            _msp0_op(state.sp), *ops)

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
        if self._fat:
            return self._fat_call(state, direction, zi, sym_in, None, msp, False)
        _, _, eout, qb, kind, e0, w = self._op_kinds(direction, zi)
        mu, scale = self._mu_scale(direction, zi, sym_in)
        if self.ccfg.use_fused:
            A, B = _ab_from_op(mu, scale, e0, w, kind)
            S = 256 if (direction == "generate" and zi == 0) else self.ccfg.zsupport
            return _dec_affine_op(state, A, B, msp, S, kind)
        return _dec_op(state, _build_tab_op(mu, scale, eout, qb), msp)

    def _enc(self, state, direction, zi, sym_in, syms):
        """Encode `syms` under the (direction, zi) model op."""
        if self._fat:
            st, _, _ = self._fat_call(state, direction, zi, sym_in, syms,
                                      self._dummy_sp(state), True)
            return st
        _, _, eout, qb, kind, e0, w = self._op_kinds(direction, zi)
        mu, scale = self._mu_scale(direction, zi, sym_in)
        if self.ccfg.use_fused:
            A, B = _ab_from_op(mu, scale, e0, w, kind)
            S = 256 if (direction == "generate" and zi == 0) else self.ccfg.zsupport
            return _enc_affine_op(state, A, B, syms, S, kind)
        return _enc_op(state, _build_tab_op(mu, scale, eout, qb), syms)

    def _prior_enc(self, state, syms):
        op = _enc_shared_op_d if (self._fat and _donate()) else _enc_shared_op
        return op(state, self.prior_cdf_table, syms)

    def _prior_dec(self, state, msp):
        op = _dec_shared_op_d if (self._fat and _donate()) else _dec_shared_op
        return op(state, self.prior_cdf_table, msp)

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
            state = self._prior_enc(state, zsym)
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
            state = self._prior_enc(state, zs[-1])
        return state, msp

    def _decode_one(self, state: LaneState, msp) -> Tuple[LaneState, jnp.ndarray, jnp.ndarray]:
        """Receiver for one datapoint (mnist_compress.py:284-354).  Returns
        (state, x (L, xdim) int32, msp)."""
        nz = self.ccfg.model.nz
        state, zsymtop, msp = self._prior_dec(state, msp)

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
        if self._use_program:
            st, _, _, _ = self._prog_call(state, jnp.asarray(xs), "encode", xs.shape[0])
            return st
        state, msp = self._arm(state)
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
        return self._detach(state)

    def encode_model_only(self, state: LaneState, xs) -> LaneState:
        """PHASE-TIMING INSTRUMENT, not a codec: the encode descriptor
        stream with every coder op a no-op (program.py run_program
        coder_noop) — model passes and CDF builds execute in the same
        compiled-scan regime as the real encode, rANS steps don't.  The
        returned state is meaningless except as a sync handle; wall time of
        this call vs encode_datapoints gives the honest model/coder split
        (bench.py phase breakdown)."""
        assert self._use_program, "phase instrument needs program dispatch"
        st, _, _, _ = self._prog_call(state, jnp.asarray(xs), "encode",
                                      xs.shape[0], coder_noop=True)
        return st

    def encode_datapoints_with_counts(self, state: LaneState, xs):
        """Returns (state, sp_per_datapoint (T, L) int32) — the experiment
        harness derives the reference's `nets`/`cma` metrics from these
        (mnist_compress.py:254-260)."""
        if self._use_program:
            T = xs.shape[0]
            st, _, _, sp_trace = self._prog_call(state, jnp.asarray(xs), "encode", T)
            nz = self.ccfg.model.nz
            ends = np.arange(1, T + 1) * (2 * nz + 2) - 1
            return st, sp_trace[jnp.asarray(ends)]
        state, msp = self._arm(state)
        sps = []
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
            # snapshot a COPY: later ops donate (and so invalidate) state.sp
            sps.append(_msp0_op(state.sp) if self._donating else state.sp)
        return self._detach(state), jnp.stack(sps)

    def encode_datapoints_with_min_sp(self, state: LaneState, xs):
        """Returns (state, min_sp (L,) int32) — min_sp words at the bottom of
        each lane's stack were never consumed and may be trimmed from the
        serialized container (demo_compress.py:160)."""
        if self._use_program:
            st, _, msp, _ = self._prog_call(state, jnp.asarray(xs), "encode", xs.shape[0])
            return st, msp
        state, msp = self._arm(state)
        for t in range(xs.shape[0]):
            state, msp = self._encode_one(state, jnp.asarray(xs[t]), msp)
        return self._detach(state), self._detach(msp)

    def rest_sp(self, state: LaneState, x0):
        """Stack pointer right after the first decode op(s) of the first
        datapoint — the reference's `restbits` snapshot used to discount
        unconsumed initial bits (mnist_compress.py:190-193 Bit-Swap;
        :225-227 BB-ANS takes it after ALL nz decodes)."""
        nz = self.ccfg.model.nz
        st, msp = self._arm(state)
        st, zsymtop, msp = self._dec(st, "infer", 0, jnp.asarray(x0), msp)
        if not self.ccfg.bitswap:
            for zi in range(1, nz):
                st, zsymtop, msp = self._dec(st, "infer", zi, zsymtop, msp)
        return self._detach(st.sp)

    def decode_datapoints(self, state: LaneState, num_datapoints: int):
        """Returns (state, xs (T, L, xdim) int32) in natural (encode) order —
        the receiver pops datapoints LIFO (mnist_compress.py:278)."""
        if self._use_program:
            cfg = self.ccfg.model
            zeros = jnp.zeros((num_datapoints, state.num_lanes, cfg.xdim), jnp.int32)
            st, xs_buf, _, _ = self._prog_call(state, zeros, "decode", num_datapoints)
            return st, xs_buf
        state, msp = self._arm(state)
        xs = []
        for _ in range(num_datapoints):
            state, x, msp = self._decode_one(state, msp)
            xs.append(x)
        return self._detach(state), jnp.stack(xs[::-1])

    @property
    def _donating(self) -> bool:
        return self._fat and _donate()

    def _detach(self, tree):
        """Fresh (non-donated-aliased) copies of a donating chain's results:
        safe for host fetch and for re-entering another donating chain."""
        return _copy_state_op(tree) if self._donating else tree

    def _arm(self, state: LaneState):
        """Entry guard for the public drivers: when the fat ops donate
        buffers, hand them a private copy of the caller's state (the caller
        keeps a valid `state`, e.g. for re-runs or the bits-back comparison)
        and a min-sp buffer that is not an alias of the donated state.sp."""
        if self._donating:
            state = _copy_state_op(state)
            return state, _msp0_op(state.sp)
        return state, state.sp


def make_codec(params, ccfg: CodecConfig, bins: DiscretizationBins) -> Codec:
    return Codec(params, ccfg, bins)


def net_words(state: LaneState) -> np.ndarray:
    """Per-lane stream length in 32-bit words, counting the head as the
    reference does (the head is one list element regardless of 33..64-bit
    occupancy: len(state) = words + 1)."""
    return np.asarray(state.sp) + 1
