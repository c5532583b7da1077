"""The scan-batched discretize chains must reproduce the per-batch loop
byte-for-byte: the scan replays the loop's key-split sequence, so cached
bins stay valid across the fast path (codec/discretize.py)."""

import numpy as np
import jax
import pytest

import bitswap_tpu.codec.discretize as D
from bitswap_tpu.models import VAEConfig, init_params
from bitswap_tpu.train.data import synthetic_images


def test_scan_chain_matches_loop_exactly():
    cfg = VAEConfig(xs=(32, 32, 1), nz=3, zchannels=1, nprocessing=1,
                    resdepth=3, reswidth=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    data = synthetic_images(64, cfg.xs, seed=0).astype(np.float32)

    fast = D.discretize_bins(params, cfg, 6, jax.random.PRNGKey(3),
                             data=data, batch_size=128)

    # rebuild with the loop fallback forced (source-level flag flip keeps
    # every other line identical)
    src = open(D.__file__).read()
    assert "fast = nsamples % batch_size == 0" in src
    ns = {}
    exec(compile(src.replace("fast = nsamples % batch_size == 0",
                             "fast = False"), "discretize_loop", "exec"), ns)
    loop = ns["discretize_bins"](params, cfg, 6, jax.random.PRNGKey(3),
                                 data=data, batch_size=128)

    np.testing.assert_array_equal(np.asarray(fast.zendpoints),
                                  np.asarray(loop.zendpoints))
    np.testing.assert_array_equal(np.asarray(fast.zcentres),
                                  np.asarray(loop.zcentres))
