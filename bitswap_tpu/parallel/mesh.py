"""Device-mesh parallelism: DP training and pod-scale lane-parallel coding.

The reference's only parallelism is Horovod data-parallel training
(mnist_train.py:878-995: fp16 ring-allreduce of grads, rank-0 broadcasts,
batch divided by world size).  The TPU-native equivalents here:

- training: a 1-D `data` mesh; parameters replicated, batch sharded along
  the data axis.  Under jit, XLA inserts the gradient all-reduce over ICI —
  there is no hand-written communication.
- coding: ANS stream lanes are embarrassingly parallel (independent
  images/experiments/block-rows, imagenetcrop_compress.py:279-305), so the
  `LaneState` pytree is sharded along its lane axis and the whole codec —
  VAE passes, table builds, coder scans — runs SPMD with zero collectives.
  Weights and discretization bins are replicated once (the reference's
  hvd.broadcast_parameters analog is just jax.device_put with a replicated
  sharding).

Multi-host: `jax.distributed.initialize()` + the same code; the mesh simply
spans all processes' devices.  Host-side stream gather for containers uses
`jax.device_get` per lane in deterministic lane order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bitswap_tpu.ans.vectorized import LaneState, pad_lane_state
from bitswap_tpu.models.vae import VAEConfig
from bitswap_tpu.train.runtime import TrainConfig, TrainState, make_train_step


def data_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    # AxisType.Auto: shardings propagate through jit via GSPMD (jax>=0.9
    # defaults make_mesh to Explicit, which would demand out_sharding
    # annotations on every reshape/gather in the model and coder)
    return jax.make_mesh(
        (n,), (axis,), axis_types=(jax.sharding.AxisType.Auto,), devices=devices[:n]
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (weights, bins, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard a (B, ...) array along the mesh data axis."""
    spec = P(axis, *([None] * (np.ndim(batch) - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def shard_lane_state(mesh: Mesh, state: LaneState, axis: str = "data") -> LaneState:
    """Shard every per-lane array of the coder state along the lane axis.

    When L is not a multiple of the mesh axis, the state is padded with
    dummy lanes first (pad_lane_state) — callers must pad the symbol batch
    to match (pad_lanes_like) and slice decoded lanes back to the real L;
    container.pack_lanes(num_lanes=L) drops the padding at serialization.
    """
    n = mesh.shape[axis]
    L = state.num_lanes
    if L % n:
        state = pad_lane_state(state, L + n - L % n)

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return LaneState(*(put(x) for x in state))


def pad_lanes_like(mesh: Mesh, xs, axis: str = "data", lane_axis: int = 1):
    """Pad a (T, L, ...) symbol batch along its lane axis to the padded lane
    count shard_lane_state will use (repeats the last lane; padding lanes'
    outputs are discarded)."""
    n = mesh.shape[axis]
    L = xs.shape[lane_axis]
    if L % n == 0:
        return xs
    extra = n - L % n
    widths = [(0, 0)] * np.ndim(xs)
    widths[lane_axis] = (0, extra)
    return jnp.pad(xs, widths, mode="edge")


def make_dp_train_step(cfg: VAEConfig, tcfg: TrainConfig, mesh: Mesh, axis: str = "data",
                       grad_compress: str = "none"):
    """Data-parallel train step: params/opt/ema replicated, batch sharded.

    Returns (step_fn, prepare_state, prepare_batch).

    grad_compress="none" (default): the step is the same jitted function as
    single-chip (make_train_step); the shardings make XLA emit the f32
    gradient psum over ICI — exact, and the framework-native mode.

    grad_compress="bfloat16"|"float16": the reference's Horovod
    fp16-compressed ring-allreduce parity (mnist_train.py:940-943).  The
    step body runs under shard_map: each shard takes local-batch gradients,
    casts them to the compressed dtype, psums over the mesh axis (half the
    ICI traffic of f32), casts back, and averages — then the optimizer/EMA
    update runs replicated.  Metrics are pmean'd over shards.  bf16 keeps
    f32's range (preferred on TPU); f16 matches the reference bit-width.
    """
    if grad_compress == "none":
        step = make_train_step(cfg, tcfg)
    else:
        cdt = jnp.dtype(grad_compress)
        assert cdt in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)), grad_compress
        n = mesh.shape[axis]

        def grad_reduce(grads):
            return jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g.astype(cdt), axis).astype(g.dtype) / n,
                grads,
            )

        body = make_train_step(cfg, tcfg, grad_reduce=grad_reduce, jit_it=False)

        def sharded_body(state, key, batch_shard):
            # decorrelate per-shard MC/dropout noise (the global-batch run
            # draws one noise field over the whole batch)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            new_state, metrics = body(state, key, batch_shard)
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, axis), metrics)
            return new_state, metrics

        from jax.experimental.shard_map import shard_map

        step = jax.jit(
            shard_map(
                sharded_body, mesh=mesh,
                in_specs=(P(), P(), P(axis)),
                out_specs=(P(), P()),
            ),
            donate_argnums=(0,),
        )

    def prepare_state(state: TrainState) -> TrainState:
        return replicate(mesh, state)

    def prepare_batch(batch):
        return shard_batch(mesh, batch, axis)

    return step, prepare_state, prepare_batch
