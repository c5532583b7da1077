"""mnist-class codec saturation probe: lane count sweep in bfloat16.

The round-5 bench headline (bench_r5_final.json) measures the mnist-class
model at L=1024 (17.4/18.7 MB/s); this probe checks whether the small
(rw62) model keeps scaling past that — its per-pass weight traffic is tiny,
so the lane axis should amortize launch + coder fixed costs further than
the RGB model's.  Used to pick bench.py's mnist lane plan.

Usage: python scripts/mnist_probe.py [--lanes 1024 2048 4096] [--T 16]
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
    ap.add_argument("--lanes", type=int, nargs="+", default=[1024, 2048, 4096])
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bitswap_tpu.ans.vectorized import arrays_equal, lane_states_equal
    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec, net_words
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import data_dependent_init, init_params
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params
    from bitswap_tpu.utils.registry import get_spec

    cfg = get_spec("mnist").model_config(4, dropout_p=0.0)
    test_data, _ = load_dataset("mnist", "test", cfg.xs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    warm = jnp.asarray(test_data[:256].astype(np.float32))
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), warm)
    params = load_params("params/mnist/nz4.msgpack", params)
    bins = discretize_bins(
        params, cfg, 10, jax.random.PRNGKey(2), data=test_data[:512],
        cache_path="bins/bench_mnist_nz4_qb10.npz",
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

    verified = False
    for L in args.lanes:
        idx = np.random.RandomState(100).choice(len(test_data), size=T * L)
        xs = test_data[idx].reshape(T, L, cfg.xdim).astype(np.int32)
        xs_dev = jnp.asarray(xs)
        ccfg = CodecConfig(
            model=cfg, quantbits=10, bitswap=True, table_dtype="float32",
            compute_dtype=args.dtype, init_words=2048,
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

        rec = {"dtype": args.dtype, "lanes": L, "T": T,
               "MB": round(T * L * cfg.xdim / 1e6, 2),
               "compile_enc_s": round(compile_enc, 1),
               "compile_dec_s": round(compile_dec, 1)}
        if not verified:
            verified = True
            ok = bool(arrays_equal(decoded, xs_dev))
            ok_state = bool(np.all(np.asarray(lane_states_equal(state_back, state0))))
            w0, w1 = net_words(state0), net_words(state)
            rec.update(roundtrip_exact=ok and ok_state,
                       net_bits_per_dim=round(
                           float(np.mean((w1 - w0) * 32.0 / (T * cfg.xdim))), 4))

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
