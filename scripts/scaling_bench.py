"""CPU-mesh scaling harness: codec + DP train step at mesh sizes 1/2/4/8.

Real multi-chip hardware is unavailable in this environment (one tunneled
chip), so this measures the SPMD paths on the virtual CPU mesh
(`--xla_force_host_platform_device_count`), the same mechanism the tests
and the driver's `dryrun_multichip` use.  Virtual devices share the host's
cores, so wall-clock SPEEDUP is not expected here; what the harness
establishes is (a) the partitioning is real (per-device lane/batch slices
shrink with the mesh), (b) SPMD partition + collective overhead vs the
1-device baseline — `overhead = t_n / t_1` — stays bounded, and (c) the
identical code path a real pod would run (SURVEY.md §7 item 7: scaling
efficiency at N hosts is measured by running THIS harness there).

Writes SCALING.json at the repo root:
    {"mesh": [{"n": 1, "codec_s": ..., "train_step_s": ..., ...}, ...]}

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py [--lanes 64] [--datapoints 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def bench_mesh(n: int, lanes: int, ndatapoints: int, batch: int, repeats: int):
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import VAEConfig, data_dependent_init, init_params
    from bitswap_tpu.parallel.mesh import (
        data_mesh,
        make_dp_train_step,
        replicate,
        shard_lane_state,
    )
    from bitswap_tpu.train.data import synthetic_images
    from bitswap_tpu.train.runtime import TrainConfig, init_train_state

    mesh = data_mesh(n)
    cfg = VAEConfig(xs=(32, 32, 1), nz=4, zchannels=1, nprocessing=1,
                    resdepth=4, reswidth=16)
    data = synthetic_images(max(batch, 64), cfg.xs, seed=0).astype(np.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1),
                                 jnp.asarray(data[:64]))

    # --- DP train step -----------------------------------------------------
    tcfg = TrainConfig()
    step, prep_state, prep_batch = make_dp_train_step(cfg, tcfg, mesh)
    state = prep_state(init_train_state(params, tcfg))
    xb = prep_batch(jnp.asarray(data[:batch]))
    state, _ = step(state, jax.random.PRNGKey(2), xb)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(repeats):
        state, metrics = step(state, jax.random.PRNGKey(3 + i), xb)
    jax.block_until_ready(state.params)
    train_step_s = (time.perf_counter() - t0) / repeats

    # --- lane-sharded codec ------------------------------------------------
    bins = discretize_bins(params, cfg, quantbits=10,
                           key=jax.random.PRNGKey(3), data=data, batch_size=64)
    ccfg = CodecConfig(model=cfg, quantbits=10, bitswap=True,
                       table_dtype="float32", init_words=2048, capacity=65536)
    codec = make_codec(replicate(mesh, params), ccfg, bins)
    xs = synthetic_images(ndatapoints * lanes, cfg.xs, seed=7).reshape(
        ndatapoints, lanes, cfg.xdim).astype(np.int32)
    # lanes ride axis 1 of xs; sharding the state pins the layout and the
    # replicated xs follows through GSPMD propagation
    xs_dev = jnp.asarray(xs)
    st0 = shard_lane_state(mesh, codec.init_state(lanes))
    st = codec.encode_datapoints(st0, xs_dev)  # compile
    jax.block_until_ready(st.buf)
    t0 = time.perf_counter()
    for _ in range(repeats):
        st = codec.encode_datapoints(st0, xs_dev)
        jax.block_until_ready(st.buf)
    codec_s = (time.perf_counter() - t0) / repeats

    mb = ndatapoints * lanes * cfg.xdim / 1e6
    return {
        "n_devices": n,
        "train_step_s": round(train_step_s, 4),
        "train_batch": batch,
        "codec_encode_s": round(codec_s, 4),
        "codec_lanes": lanes,
        "codec_datapoints": ndatapoints,
        "codec_MB": mb,
        "codec_MBps": round(mb / codec_s, 3),
        "lanes_per_device": lanes // n,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mesh-sizes", default="1,2,4,8")
    p.add_argument("--lanes", type=int, default=64)
    p.add_argument("--datapoints", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default="SCALING.json")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    assert len(jax.devices()) >= max(sizes), (
        f"need {max(sizes)} virtual devices; set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    rows = []
    for n in sizes:
        row = bench_mesh(n, args.lanes, args.datapoints, args.batch,
                         args.repeats)
        base = rows[0] if rows else row
        row["train_overhead_vs_1dev"] = round(
            row["train_step_s"] / base["train_step_s"], 3)
        row["codec_overhead_vs_1dev"] = round(
            row["codec_encode_s"] / base["codec_encode_s"], 3)
        rows.append(row)
        print(json.dumps(row))

    out = {
        "note": ("virtual CPU mesh: devices share host cores, so t_n ~ t_1 "
                 "is ideal (overhead 1.0 = zero SPMD partition cost); real "
                 "multi-chip speedup must be measured on hardware with this "
                 "same harness"),
        "mesh": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
