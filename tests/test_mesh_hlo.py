"""Partitioning regression tests for the shared codec ops.

The host-loop drivers dispatch many small programs per datapoint; on a
lane-sharded mesh each must partition WITHOUT data-sized collectives — an op
compiling to an all-gather of the stream buffers both defeats the sharding
(gathers every lane's buffer to every device) and can deadlock interleaved
async dispatch on the CPU backend (round-3 regression: the arange-indexed
scatter in _append_words).  These tests pin the compiled HLO of every coder
op to carry no collective with a non-scalar result.  Scalar all-reduces ARE
permitted: the windowed buffer ops reduce the (L,) stack pointers to one
lane-uniform window base (`jnp.min(state.sp)`, ans/vectorized.py) — a
4-byte ICI reduction per op, the price of keeping every buffer touch inside
a spread-bounded window instead of a serialized per-lane gather.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.codec import bitswap as bs
from bitswap_tpu.models import VAEConfig, init_params, data_dependent_init
from bitswap_tpu.parallel.mesh import data_mesh, replicate, shard_lane_state, pad_lanes_like
from bitswap_tpu.train.data import synthetic_images
from bitswap_tpu.codec.discretize import discretize_bins


@pytest.fixture(scope="module")
def mesh_setup():
    mesh = data_mesh(8)
    cfg = VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, nprocessing=1,
                    resdepth=2, reswidth=8)
    data = synthetic_images(16, cfg.xs, seed=0).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), jnp.asarray(data))
    bins = discretize_bins(params, cfg, quantbits=6, key=jax.random.PRNGKey(3),
                           data=data, batch_size=8)
    ccfg = bs.CodecConfig(model=cfg, quantbits=6, bitswap=True,
                          table_dtype="float32", init_words=512, capacity=4096)
    codec = bs.make_codec(replicate(mesh, params), ccfg, bins).replicate_aux(mesh)
    st0 = shard_lane_state(mesh, codec.init_state(12))
    xs = synthetic_images(12, cfg.xs, seed=7).reshape(1, 12, cfg.xdim).astype(np.int32)
    x = pad_lanes_like(mesh, jnp.asarray(xs))[0]
    return codec, st0, x


def _collective_count(compiled_text: str) -> int:
    """Number of collectives whose result is NOT scalar (shape rank > 0).

    HLO lines look like `%all-reduce.5 = s32[] all-reduce(...)` — a scalar
    result renders as `TYPE[]`; anything with dimensions (e.g. `u32[12,4096]
    all-gather`) moves O(data) over the interconnect and is forbidden."""
    n = 0
    for line in compiled_text.splitlines():
        for op in ("all-gather", "all-reduce", "all-to-all", "collective-permute"):
            if f" {op}(" in line or f"{op}-start(" in line:
                m = re.search(r"=\s*(?:\([^)]*\)|[a-z0-9]+\[([0-9,]*)\])", line)
                dims = m.group(1) if m and m.group(1) is not None else ""
                if dims.strip():  # non-scalar result
                    n += 1
    return n


def test_coder_ops_collective_free_on_lane_sharded_mesh(mesh_setup):
    codec, st0, x = mesh_setup
    mu, sc = codec._mu_scale("infer", 0, x)
    eout = codec._op_kinds("infer", 0)[2]
    tab = bs._build_tab_op(mu, sc, eout, codec.ccfg.quantbits)
    st, syms, msp = bs._dec_op(st0, tab, st0.sp)

    checks = {
        "dec_op": bs._dec_op.lower(st0, tab, st0.sp),
        "enc_op": bs._enc_op.lower(st, tab, syms),
        "dec_shared": bs._dec_shared_op.lower(st, codec.prior_cdf_table, st.sp),
        "enc_shared": bs._enc_shared_op.lower(st, codec.prior_cdf_table, syms),
        "build_tab": bs._build_tab_op.lower(mu, sc, eout, codec.ccfg.quantbits),
    }
    for name, lowered in checks.items():
        txt = lowered.compile().as_text()
        n = _collective_count(txt)
        assert n == 0, f"{name} compiled with {n} collectives under lane sharding"


def test_sharded_roundtrip_one_datapoint(mesh_setup):
    codec, st0, x = mesh_setup
    from bitswap_tpu.ans.vectorized import lane_state_to_ref_lists

    st, msp = codec._encode_one(st0, x, st0.sp)
    st2, x2, _ = codec._decode_one(st, msp)
    # lanes beyond the 12 real ones are mesh padding and decode garbage
    np.testing.assert_array_equal(np.asarray(x2)[:12], np.asarray(x)[:12])
    assert lane_state_to_ref_lists(st2)[:12] == lane_state_to_ref_lists(st0)[:12]
