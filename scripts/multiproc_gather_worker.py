"""Worker for the multi-process container-gather harness.

Launched N times (tests/test_container.py::test_multiprocess_gather and
scripts/run_multiproc_gather.py) with `jax.distributed.initialize` on CPU:
each process owns 2 forced host devices, the lane axis shards over the
2N-device global mesh, a deterministic shared-table encode runs SPMD, and
every process calls `pack_lanes` — executing the
`multihost_utils.process_allgather` path (parallel/container.py:_host_local)
that a single-process run can never reach.  Each process prints
`HASH <sha256 of the container bytes>`; the launcher asserts all processes
(and a single-process reference run) produced identical bytes.  This is the
TPU-native analog of the reference's Horovod rank-0 serialization
(model/mnist_train.py:895-899).

Usage: python scripts/multiproc_gather_worker.py <proc_id> <nprocs> <port>
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs, jax.process_count()

sys.path.insert(0, os.getcwd())

import hashlib  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bitswap_tpu.ans.tables import build_tables_ll  # noqa: E402
from bitswap_tpu.ans.vectorized import (  # noqa: E402
    ans_encode_lanes_shared,
    init_lane_state,
)
from bitswap_tpu.ops.bins import logistic_prior_bins  # noqa: E402
from bitswap_tpu.ops.logistic import logistic_cdf  # noqa: E402
from bitswap_tpu.parallel.container import pack_lanes  # noqa: E402
from bitswap_tpu.parallel.mesh import data_mesh, replicate, shard_lane_state  # noqa: E402


def main() -> int:
    L, qb, dim = 8, 5, 6
    # deterministic workload, identical on every process
    state = init_lane_state(L, capacity=512, seed=5, init_words=16)
    endpoints, _ = logistic_prior_bins(qb, dtype=jnp.float32)
    cdfs = logistic_cdf(
        jnp.broadcast_to(endpoints[None, :], (dim, (1 << qb) - 1)),
        jnp.asarray(0.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
    )
    table = build_tables_ll(cdfs[..., None], qb)[..., 0]  # (dim, S) uint32
    syms = np.asarray(
        np.arange(L * dim).reshape(L, dim) % (1 << qb), np.int32)

    mesh = data_mesh()  # all global devices
    state = shard_lane_state(mesh, state)
    table = replicate(mesh, table)
    syms_dev = jax.device_put(
        syms, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)))

    state2 = jax.jit(ans_encode_lanes_shared)(state, table, syms_dev)
    cont = pack_lanes(state2, meta=(1234, L))
    print(f"HASH {hashlib.sha256(cont.tobytes()).hexdigest()}", flush=True)
    print(f"DONE proc={proc_id}/{nprocs} devices={len(jax.devices())} "
          f"local={len(jax.local_devices())}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
