"""Benchmark: full Bit-Swap codec throughput + compression rate on one TPU chip.

Measures, per flagship config (greyscale mnist-class nz=4/rw62 and RGB
cifar-class nz=4/rw254), with TRAINED checkpoints when present:

- end-to-end encode/decode MB/s through the complete pipeline (hierarchical
  VAE passes, fused CDF evaluation, lane-parallel Pallas rANS) at up to
  three lane counts ending at the measured saturation point (mnist L=4096,
  rgb L=2048; BENCH_FULL=1 adds a small-L point);
- bit-exact round-trip + bits-back verification;
- compression rate (net bits/dim) vs classical baselines (gzip/bz2/lzma/
  PNG/WebP) on the same test images, plus coding tightness D = net - ELBO;
- a phase breakdown (model passes vs coder share);
- training-step throughput (steps/sec) and an MFU estimate on the chip.

The reference publishes no throughput numbers (SURVEY.md §6), so
`vs_baseline` is the speedup over the reference's coding architecture — the
per-symbol host-side big-int ANS loop (mnist_compress.py:49-68) driving the
same model, measured on this same machine and extrapolated from a timed
sample.

Budgeting: every section is gated on a wall-clock budget (BENCH_BUDGET_S,
default 900 s) and the final JSON line is ALWAYS printed — on overrun later
sections are skipped and recorded as such, rather than the whole run dying
with no metric (the round-3 failure mode).  A persistent XLA compilation
cache (.jax_cache/) makes reruns on the same machine skip recompilation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import time

import numpy as np

# v5e bf16 MXU peak; our convs run f32 so true f32 MFU is higher than the
# bf16-relative number reported (conservative convention)
PEAK_FLOPS_BF16 = 197e12

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "900"))


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def _log(msg: str) -> None:
    print(f"# [{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _timed(fn, *args, reps=3):
    import jax

    def sync(out):
        jax.block_until_ready(out)  # the WHOLE output tree, not just leaf 0
        # ground truth on tunneled backends: block_until_ready can return
        # before remote execution finishes, so force completion by fetching
        # the smallest chain-dependent leaf (a few KB)
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            np.asarray(min(leaves, key=lambda l: getattr(l, "size", 1 << 60)))

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


def _flops_of(jitted, *args):
    """XLA-reported flops of one call, or None if the backend can't say."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an["flops"])
    except Exception:
        return None


def bench_config(name, cfg, plan, T, detail):
    """Fills `detail` in place (so a budget overrun keeps partial results).

    plan: sequence of (compute_dtype, lane_counts) stages — e.g.
    [("bfloat16", (256, 1024)), ("float32", (1024,))].  The first stage is
    the PRIMARY mode (its first lane point carries the verification + rate
    measurement reported at top level); later stages add comparison points.
    bfloat16 runs the model passes on the MXU's native dtype — measured
    ~9x faster on the RGB model with D moving +0.002 b/d (rgb_probe r5) —
    exactness is construction-guaranteed either way and re-verified here.
    """
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.ans.vectorized import arrays_equal, lane_states_equal
    from bitswap_tpu.benchmarks.compressors import (
        bench_compressor, bz2_compress, gzip_compress, lzma_compress,
        png_compress, webp_compress,
    )
    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec, net_words
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import data_dependent_init, init_params
    from bitswap_tpu.models.vae import loss_per_sample
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params

    quantbits = 10
    test_data, synthetic = load_dataset(name, "test", cfg.xs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    warm = jnp.asarray(test_data[:256].astype(np.float32))
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), warm)
    ckpt = os.path.join("params", name, f"nz{cfg.nz}.msgpack")
    trained = os.path.exists(ckpt)
    if trained:
        params = load_params(ckpt, params)
        _log(f"[{name}] loaded trained checkpoint {ckpt}")
    else:
        _log(f"[{name}] no checkpoint; DDI-only weights")

    bins = discretize_bins(
        params, cfg, quantbits, jax.random.PRNGKey(2), data=test_data[:512],
        cache_path=f"bins/bench_{name}_nz{cfg.nz}_qb{quantbits}.npz",
    )

    from bitswap_tpu.ans.vectorized import _DECODE_SYM_CHUNK, _SPREAD_CAP

    detail["model"] = f"{name} nz={cfg.nz} rw{cfg.reswidth} qb{quantbits}"
    detail["trained_checkpoint"] = trained
    detail["synthetic_data"] = bool(synthetic)
    # tuned constants (VERDICT r3 #8): chunk=1024 makes decode one window
    # per op (fewer spread-cap slices, one-hot widths stay VMEM-resident);
    # measured decode/encode = 1.02 at the saturated point (was 0.2-0.9)
    detail["decode_sym_chunk"] = _DECODE_SYM_CHUNK
    detail["lane_spread_cap"] = _SPREAD_CAP

    # classical baselines on the very images the codec compresses
    imgs = test_data[:100]
    detail["baselines_bpd"] = {
        lab: round(bench_compressor(fn, imgs), 3)
        for lab, fn in [
            ("gzip", gzip_compress), ("bz2", bz2_compress),
            ("lzma", lzma_compress), ("png", png_compress),
            ("webp", webp_compress),
        ]
    }

    curve = []
    best = None
    best_ctx = None
    detail["rates"] = {}
    for dtype, lane_counts in plan:
        for L in lane_counts:
            if curve and _remaining() < 120:
                _log(f"[{name}] budget: stopping at {dtype} L={L}")
                detail["skipped_from"] = f"{dtype}:L{L}"
                break
            idx = np.random.RandomState(100).choice(len(test_data), size=T * L)
            xs = test_data[idx].reshape(T, L, cfg.xdim).astype(np.int32)
            xs_dev = jnp.asarray(xs)
            ccfg = CodecConfig(
                model=cfg, quantbits=quantbits, bitswap=True, table_dtype="float32",
                compute_dtype=dtype,
                init_words=2048, capacity=2048 + T * cfg.xdim + 4096,
            )
            codec = make_codec(params, ccfg, bins)
            state0 = codec.init_state(L)

            t0 = time.time()
            state = codec.encode_datapoints(state0, xs_dev)
            jax.block_until_ready(state.buf)
            _log(f"[{name}] {dtype} L={L} encode compile+run {time.time()-t0:.1f}s")
            assert not np.any(np.asarray(state.overflow)), "stream overflow"
            t0 = time.time()
            state_back, decoded = codec.decode_datapoints(state, T)
            jax.block_until_ready(decoded)
            _log(f"[{name}] {dtype} L={L} decode compile+run {time.time()-t0:.1f}s")

            if dtype not in detail["rates"]:  # verify + rate once per dtype
                # on-device comparisons: one scalar / (L,) bool fetch each
                # (full buffer fetches are slow over the tunneled backend)
                assert bool(arrays_equal(decoded, xs_dev)), "round-trip mismatch"
                assert bool(np.all(np.asarray(lane_states_equal(state_back, state0)))), \
                    "bits-back invariant violated"
                w0, w1 = net_words(state0), net_words(state)
                net_bpd = float(np.mean((w1 - w0) * 32.0 / (T * cfg.xdim)))
                # one scan over ALL T datapoints: D = net - ELBO is the
                # headline tightness number, so keep its MC noise low
                def _elbo_all(p, xs_all):
                    def step(t, xt):
                        xb = xt.reshape((L,) + cfg.xs).astype(jnp.float32)
                        key = jax.random.fold_in(jax.random.PRNGKey(0), t)
                        return t + 1, loss_per_sample(p, cfg, key, xb)
                    _, out = jax.lax.scan(step, 0, xs_all)
                    return out

                elbo_bpd = float(np.mean(np.asarray(jax.jit(_elbo_all)(params, xs_dev))))
                detail["rates"][dtype] = {
                    "roundtrip_exact": True,
                    "net_bits_per_dim": round(net_bpd, 4),
                    "elbo_bits_per_dim": round(elbo_bpd, 4),
                    "coding_overhead_D": round(net_bpd - elbo_bpd, 4),
                }
                if "net_bits_per_dim" not in detail:  # primary dtype
                    detail["roundtrip_exact"] = True
                    detail["net_bits_per_dim"] = round(net_bpd, 4)
                    detail["elbo_bits_per_dim"] = round(elbo_bpd, 4)
                    detail["coding_overhead_D"] = round(net_bpd - elbo_bpd, 4)
                _log(f"[{name}] {dtype}: net {net_bpd:.3f} b/d vs ELBO "
                     f"{elbo_bpd:.3f} b/d (D={net_bpd-elbo_bpd:+.4f}); best "
                     f"classical {min(detail['baselines_bpd'].values()):.3f} b/d")

            enc_t, _ = _timed(codec.encode_datapoints, state0, xs_dev)
            dec_t, _ = _timed(lambda s: codec.decode_datapoints(s, T), state)
            mb = T * L * cfg.xdim / 1e6
            point = {
                "dtype": dtype, "lanes": L, "datapoints": T, "MB": round(mb, 2),
                "encode_MBps": round(mb / enc_t, 3), "decode_MBps": round(mb / dec_t, 3),
                "encode_s": round(enc_t, 4), "decode_s": round(dec_t, 4),
            }
            curve.append(point)
            detail["lanes_curve"] = curve
            _log(f"[{name}] {dtype} L={L}: encode {point['encode_MBps']} MB/s, "
                 f"decode {point['decode_MBps']} MB/s")
            if best is None or point["encode_MBps"] > best["encode_MBps"]:
                best = point
                best_ctx = (codec, state0, xs_dev, enc_t)

    detail["encode_MBps"] = best["encode_MBps"]
    detail["decode_MBps"] = best["decode_MBps"]
    detail["lanes"] = best["lanes"]
    detail["headline_dtype"] = best["dtype"]

    if _remaining() < 90:
        _log(f"[{name}] budget: skipping phase breakdown")
        return detail
    # phase breakdown at the best point, measured INSIDE the program-dispatch
    # regime (VERDICT r4 weak #2: per-op dispatches are ~23ms-launch-bound
    # and overstated the model share 4.5x): run the same encode descriptor
    # stream with every coder op replaced by a no-op branch — one extra
    # compiled program — and difference the wall times.
    codec, state0, xs_dev, enc_t = best_ctx
    t0 = time.time()
    model_t, _ = _timed(codec.encode_model_only, state0, xs_dev)
    _log(f"[{name}] coder-noop program compile+best: {time.time()-t0:.1f}s / {model_t:.3f}s")
    detail["phase_model_s"] = round(model_t, 4)
    detail["phase_coder_s"] = round(max(enc_t - model_t, 0.0), 4)
    detail["phase_model_frac"] = round(min(model_t / enc_t, 1.0), 3)
    detail["phase_coder_frac"] = round(1.0 - min(model_t / enc_t, 1.0), 3)

    from bitswap_tpu.codec.bitswap import _model_op

    try:
        nz = cfg.nz
        L = detail["lanes"]
        zsym = jnp.full((L, cfg.zdim), codec.ccfg.zsupport // 2, jnp.int32)
        flops = 0.0
        for direction, zi, sym in [("infer", 0, xs_dev[0]), ("generate", 0, zsym)] + [
            (d, zi, zsym) for zi in range(1, nz) for d in ("infer", "generate")
        ]:
            in_is_x, cin = codec._op_kinds(direction, zi)[:2]
            an = _model_op.lower(
                cfg, codec.ccfg.symbol_order, direction, zi, in_is_x,
                codec.ccfg.compute_dtype, codec._params_compute, sym, cin,
            ).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            flops += float(an["flops"]) * xs_dev.shape[0]
        detail["model_gflops_per_encode"] = round(flops / 1e9, 1)
        # MFU from the IN-PROGRAM model time (the noop-program wall), not
        # from standalone launch-dominated dispatches
        detail["model_mfu_vs_bf16_peak"] = round(flops / model_t / PEAK_FLOPS_BF16, 4)
    except Exception as e:
        _log(f"[{name}] cost analysis unavailable: {e}")
    return detail


def bench_train_step(name, cfg, B=128):
    """steps/sec + MFU of the jitted train step (mnist_train.py:693-696).

    The final elbo is FETCHED, not just block_until_ready'd: on the
    tunneled backend block_until_ready can return at dispatch time, which
    measured a fantasy 410 steps/s (MFU 0.97) — the fetch forces the whole
    20-step chain and reproduces the honest 116 steps/s."""
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.models import init_params
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import TrainConfig, init_train_state, make_train_step

    data, _ = load_dataset(name, "train", cfg.xs)
    batch = jnp.asarray(data[:B].astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_params(k, cfg))(key)
    tcfg = TrainConfig()
    state = init_train_state(params, tcfg)
    step_fn = make_train_step(cfg, tcfg)
    state, m = step_fn(state, key, batch)
    np.asarray(m["elbo"])
    N = 20
    dt = float("inf")
    for _ in range(3):  # best-of-3: late-session tunnel samples vary ~2x
        t0 = time.time()
        for _ in range(N):
            state, m = step_fn(state, key, batch)
        np.asarray(m["elbo"])  # forces the chained steps, see docstring
        dt = min(dt, (time.time() - t0) / N)
    out = {"batch": B, "step_s": round(dt, 5), "steps_per_sec": round(1 / dt, 1),
           "images_per_sec": round(B / dt, 1)}
    flops = _flops_of(step_fn, state, key, batch)
    if flops is not None:
        out["gflops_per_step"] = round(flops / 1e9, 1)
        out["mfu_vs_bf16_peak"] = round(flops / dt / PEAK_FLOPS_BF16, 4)
    return out


def _reference_coder_mbs(cfg):
    """Time the reference's coding architecture: per-symbol host big-int ANS
    (RefANS is that state machine) fed by per-call table quantization, one
    lane, batch 1 — extrapolated to MB/s from a sample of symbols."""
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.ans.reference import RefANS, fresh_state
    from bitswap_tpu.ans.tables import quantize_pmfs
    from bitswap_tpu.ops.logistic import logistic_cdf

    # one realistic x-layer table set (the dominant cost profile): per-call
    # quantization then the per-symbol big-int loop, like
    # mnist_compress.py:181-203.  Compiled before the timer starts, so the
    # baseline is charged only the EXECUTION the reference pays per step.
    rng = np.random.default_rng(0)
    seq = cfg.zdim
    mu = jnp.asarray(rng.normal(0, 1, (seq, 1)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.3, 1.0, (seq, 1)).astype(np.float32))
    ep = jnp.asarray(np.linspace(-4, 4, 1023, dtype=np.float32))

    def _pmf_tables(mu, scale):
        cdfs = logistic_cdf(ep[None, :], mu, scale)
        left = cdfs[..., :1]
        right = 1.0 - cdfs[..., -1:]
        mid = cdfs[..., 1:] - cdfs[..., :-1]
        pmf = jnp.concatenate([left, mid, right], axis=-1)
        return quantize_pmfs(pmf, 10)

    pmf_tables = jax.jit(_pmf_tables)
    jax.block_until_ready(pmf_tables(mu, scale).pmf)  # compile outside timer
    t0 = time.time()
    tables = pmf_tables(mu, scale)
    ref = RefANS(np.asarray(tables.pmf), np.asarray(tables.cdf))
    state = fresh_state(seed=1, nwords=4096)
    syms = np.random.default_rng(0).integers(0, ref.pmf.shape[1], size=ref.seq_len)
    state = ref.encode(state, syms)
    ref.decode(state)
    dt = time.time() - t0
    # that sample coded seq_len symbols twice (enc+dec); per datapoint the
    # reference runs (2nz+1) such ops plus 2nz+1 model passes — count only
    # the coding, which is strictly favorable to the baseline
    return (2 * ref.seq_len / 1e6) / dt


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bitswap_tpu.utils.registry import get_spec

    dev = jax.devices()[0]
    _log(f"device: {dev.device_kind} ({dev.platform}); budget {_BUDGET:.0f}s")
    on_tpu = dev.platform in ("tpu", "axon")
    full = os.environ.get("BENCH_FULL", "0") == "1"

    detail_mnist = {}
    detail = {"mnist": detail_mnist, "rgb": None, "train_step": None,
              "budget_s": _BUDGET}
    status = {"ok": False}
    try:
        mnist_cfg = get_spec("mnist").model_config(4, dropout_p=0.0)
        # primary mode bfloat16 (the TPU-native fast path; measured D
        # +0.007 b/d vs f32 on the trained model), f32 comparison point after
        if on_tpu:
            # 4096 is the measured saturation point (mnist_probe r5:
            # 17.4/17.4/17.7 MB/s encode at L=1024/2048/4096); the budget
            # gate skips it if the run is tight.
            mnist_plan = [("bfloat16", (256, 1024, 4096, 64) if full
                          else (256, 1024, 4096)),
                          ("float32", (1024,))]
        else:
            mnist_plan = [("float32", (8,))]
        bench_config("mnist", mnist_cfg, mnist_plan, T=16 if on_tpu else 2,
                     detail=detail_mnist)

        if on_tpu and os.path.exists("params/cifar/nz4.msgpack") and _remaining() > 240:
            rgb_cfg = get_spec("cifar").model_config(4, dropout_p=0.0)
            detail["rgb"] = {}
            bench_config(
                "cifar", rgb_cfg,
                [("bfloat16", (256, 1024, 2048)), ("float32", (1024,))],
                T=8, detail=detail["rgb"],
            )
        elif on_tpu:
            _log("skipping RGB section (budget or no checkpoint)")

        if on_tpu and _remaining() > 120:
            try:
                detail["train_step"] = bench_train_step("mnist", mnist_cfg)
                _log(f"train step: {detail['train_step']}")
                if _remaining() > 150:  # batch scaling point: MFU rises with B
                    detail["train_step_b256"] = bench_train_step(
                        "mnist", mnist_cfg, B=256)
                    _log(f"train step B=256: {detail['train_step_b256']}")
            except Exception as e:
                _log(f"train-step bench failed: {e}")
        status["ok"] = True
    finally:
        # the headline metric must ALWAYS print, from whatever completed
        try:
            ref_mbs = _reference_coder_mbs(get_spec("mnist").model_config(4, dropout_p=0.0))
            detail["reference_measured"] = True
        except Exception:
            ref_mbs = 0.0034  # last full measurement on this host (BENCH_r02)
            detail["reference_measured"] = False  # stale constant, not a measurement
        _log(f"reference-architecture (host big-int loop): {ref_mbs:.4f} MB/s")
        enc = detail_mnist.get("encode_MBps", 0.0)
        dec = detail_mnist.get("decode_MBps", 0.0)
        total_mbs = round(2 / (1 / enc + 1 / dec), 3) if enc and dec else 0.0
        detail["reference_loop_MBps"] = round(ref_mbs, 4)
        detail["decode_over_encode"] = round(dec / enc, 3) if enc else None
        detail["completed"] = status["ok"]
        detail["elapsed_s"] = round(time.time() - _T0, 1)
        print(json.dumps({
            "metric": "bitswap encode+decode throughput per chip",
            "value": total_mbs,
            "unit": "MB/s",
            "vs_baseline": round(total_mbs / ref_mbs, 1) if ref_mbs else None,
            "detail": detail,
        }), flush=True)


if __name__ == "__main__":
    main()
