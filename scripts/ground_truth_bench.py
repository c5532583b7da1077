"""Fetch-forced codec throughput measurement on the ambient TPU backend.

On the tunneled (axon) backend `block_until_ready` can return before remote
execution finishes, so block-based timings over-report by orders of
magnitude.  Every timing here is forced by FETCHING a small chain-dependent
leaf (state.sp, a few KB) — the ground truth the bench harness also uses
(bench.py:_timed).

Also prints the backend characterization that motivated the single-program
codec (codec/program.py): per-program launch latency and effective HBM
bandwidth (measured ~23 ms and ~2 GB/s on the round-4 tunnel — compute
37 TF/s but memory-starved, hence the windowed buffer ops in
ans/vectorized.py).

Usage: TL=256 python scripts/ground_truth_bench.py
"""
import os
import sys
import time

_here = globals().get("__file__", "")
if _here and os.path.isfile(_here):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(_here))))
else:
    sys.path.insert(0, os.getcwd())

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}] {m}", flush=True)


def main():
    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import init_params
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params
    from bitswap_tpu.utils.registry import get_spec

    name = os.environ.get("DS", "mnist")
    nz = int(os.environ.get("NZ", "4"))
    L = int(os.environ.get("TL", "256"))
    T = int(os.environ.get("TT", "16"))
    cfg = get_spec(name).model_config(nz, dropout_p=0.0)
    test_data, _ = load_dataset(name, "test", cfg.xs)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt = f"params/{name}/nz{nz}.msgpack"
    if os.path.exists(ckpt):
        params = load_params(ckpt, params)
        log(f"loaded {ckpt}")
    bins = discretize_bins(params, cfg, 10, jax.random.PRNGKey(2),
                           data=test_data[:512],
                           cache_path=f"bins/bench_{name}_nz{nz}_qb10.npz")
    idx = np.random.RandomState(100).choice(len(test_data), size=T * L)
    xs = jnp.asarray(test_data[idx].reshape(T, L, cfg.xdim).astype(np.int32))
    ccfg = CodecConfig(model=cfg, quantbits=10, bitswap=True,
                       init_words=2048, capacity=2048 + T * cfg.xdim + 4096)
    codec = make_codec(params, ccfg, bins)
    state0 = codec.init_state(L)
    mb = T * L * cfg.xdim / 1e6

    st = codec.encode_datapoints(state0, xs)
    np.asarray(st.sp)
    log("encode compiled+drained")
    for _ in range(3):
        t0 = time.time()
        st = codec.encode_datapoints(state0, xs)
        np.asarray(st.sp)
        log(f"encode: {time.time()-t0:.3f}s = {mb/(time.time()-t0):.2f} MB/s")
    st2, dec = codec.decode_datapoints(st, T)
    np.asarray(st2.sp)
    log("decode compiled+drained")
    for _ in range(3):
        t0 = time.time()
        st2, dec = codec.decode_datapoints(st, T)
        np.asarray(st2.sp)
        log(f"decode: {time.time()-t0:.3f}s = {mb/(time.time()-t0):.2f} MB/s")
    from bitswap_tpu.ans.vectorized import arrays_equal, lane_states_equal
    ok = bool(arrays_equal(dec, xs))
    okst = bool(np.all(np.asarray(lane_states_equal(st2, state0))))
    log(f"roundtrip data={ok} bits-back={okst}")
    assert ok and okst


if __name__ == "__main__":
    main()
