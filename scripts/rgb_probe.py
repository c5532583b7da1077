"""RGB (cifar-class) codec saturation probe: compute dtype x lane count.

VERDICT r4 task 1: the reference's headline regime is RGB
(imagenet_compress.py:71-367) and round 4 measured it at one lane point.
This probe maps the two designed-in levers on the real chip:

- compute_dtype="bfloat16" (codec/bitswap.py:110-115): halves the dominant
  per-op weight traffic of the 45M-param model and doubles MXU throughput;
  exactness is construction-guaranteed (shared executable), only the RATE
  can move (bf16 mu/scale vs f32-built bins) — measured here as D delta.
- lane count L: each model pass amortizes its weight fetch over L lanes, so
  throughput should scale ~linearly in L until activation traffic or HBM
  capacity dominates.

Prints one JSON line per (dtype, L) point; used to pick bench.py's RGB
section settings.  Usage: python scripts/rgb_probe.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_here = globals().get("__file__", "")
if _here and os.path.isfile(_here):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(_here))))
else:
    sys.path.insert(0, os.getcwd())

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.getcwd(), ".jax_cache"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip the 2048-lane point")
    ap.add_argument("--T", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bitswap_tpu.ans.vectorized import arrays_equal, lane_states_equal
    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec, net_words
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import data_dependent_init, init_params
    from bitswap_tpu.models.vae import loss_per_sample
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params
    from bitswap_tpu.utils.registry import get_spec

    cfg = get_spec("cifar").model_config(4, dropout_p=0.0)
    test_data, _ = load_dataset("cifar", "test", cfg.xs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    warm = jnp.asarray(test_data[:256].astype(np.float32))
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), warm)
    params = load_params("params/cifar/nz4.msgpack", params)
    bins = discretize_bins(
        params, cfg, 10, jax.random.PRNGKey(2), data=test_data[:512],
        cache_path="bins/bench_cifar_nz4_qb10.npz",
    )
    T = args.T

    def timed(fn, *a, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            leaves = jax.tree_util.tree_leaves(out)
            np.asarray(min(leaves, key=lambda l: getattr(l, "size", 1 << 60)))
            best = min(best, time.time() - t0)
        return best

    points = [("float32", 256), ("float32", 1024), ("bfloat16", 256),
              ("bfloat16", 1024)]
    if not args.quick:
        points.append(("bfloat16", 2048))
        points.append(("float32", 2048))

    rate_done = set()
    for dtype, L in points:
        idx = np.random.RandomState(100).choice(len(test_data), size=T * L)
        xs = test_data[idx].reshape(T, L, cfg.xdim).astype(np.int32)
        xs_dev = jnp.asarray(xs)
        ccfg = CodecConfig(
            model=cfg, quantbits=10, bitswap=True, table_dtype="float32",
            compute_dtype=dtype, init_words=2048,
            capacity=2048 + T * cfg.xdim + 4096,
        )
        codec = make_codec(params, ccfg, bins)
        state0 = codec.init_state(L)

        t0 = time.time()
        state = codec.encode_datapoints(state0, xs_dev)
        jax.block_until_ready(state.buf)
        compile_enc = time.time() - t0
        assert not np.any(np.asarray(state.overflow)), "overflow"
        t0 = time.time()
        state_back, decoded = codec.decode_datapoints(state, T)
        jax.block_until_ready(decoded)
        compile_dec = time.time() - t0

        rec = {"dtype": dtype, "lanes": L, "T": T,
               "MB": round(T * L * cfg.xdim / 1e6, 2),
               "compile_enc_s": round(compile_enc, 1),
               "compile_dec_s": round(compile_dec, 1)}

        if dtype not in rate_done:  # rate + verification once per dtype
            rate_done.add(dtype)
            ok = bool(arrays_equal(decoded, xs_dev))
            ok_state = bool(np.all(np.asarray(lane_states_equal(state_back, state0))))
            w0, w1 = net_words(state0), net_words(state)
            net_bpd = float(np.mean((w1 - w0) * 32.0 / (T * cfg.xdim)))

            def _elbo_all(p, xs_all):
                def step(t, xt):
                    xb = xt.reshape((L,) + cfg.xs).astype(jnp.float32)
                    key = jax.random.fold_in(jax.random.PRNGKey(0), t)
                    return t + 1, loss_per_sample(p, cfg, key, xb)
                _, out = jax.lax.scan(step, 0, xs_all)
                return out

            elbo = float(np.mean(np.asarray(jax.jit(_elbo_all)(params, xs_dev))))
            rec.update(roundtrip_exact=ok and ok_state,
                       net_bits_per_dim=round(net_bpd, 4),
                       elbo_bits_per_dim=round(elbo, 4),
                       coding_overhead_D=round(net_bpd - elbo, 4))

        enc_t = timed(codec.encode_datapoints, state0, xs_dev)
        dec_t = timed(lambda s: codec.decode_datapoints(s, T), state)
        mb = T * L * cfg.xdim / 1e6
        rec.update(encode_s=round(enc_t, 3), decode_s=round(dec_t, 3),
                   encode_MBps=round(mb / enc_t, 3),
                   decode_MBps=round(mb / dec_t, 3),
                   harmonic_MBps=round(2 / (enc_t / mb + dec_t / mb), 3))
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
