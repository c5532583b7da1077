"""Training runtime: warmup (data-dependent init), train/eval steps, EMA.

Functional re-design of the reference's training layer
(model/mnist_train.py:557-827): free-bits KL floor of 1 bit per
(layer, channel) (:649-650), global-norm gradient clip to 1.0 (:669),
per-step exponential lr decay to a 5e-4 floor (:821-827), and the dual
parameter store (EMA'd for eval, raw for training, utils/torch/modules.py:
120-155).

Note the reference's EMA update is `shadow = mu*param + (1-mu)*shadow` with
mu=0.999 — i.e. the *new* parameter gets the 0.999 weight (modules.py:
151-155).  We replicate that semantic faithfully (`ema_on_param`).

The step is one jitted function; under a device mesh the caller shards the
batch along the data axis and XLA inserts the psum for the gradients — the
TPU-native replacement for Horovod's fp16 ring-allreduce
(mnist_train.py:940-943).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bitswap_tpu.models.vae import (
    VAEConfig,
    data_dependent_init,
    loss as vae_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-3  # mnist_train.py:846
    lr_decay: float = 0.9995  # :848 (codec-matched models use 0.99995, :602)
    min_lr: float = 5e-4  # :821
    lr_decay_after: int = 0  # imagenet variants: 100_000
    clip_norm: float = 1.0  # :669
    free_bits: float = 1.0  # :649
    ema_on_param: float = 0.999  # modules.py:123 (weight on the NEW param)
    warmup_batches: int = 25  # :991


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # scalar int32


def lr_at_step(tcfg: TrainConfig, step):
    """Reference lr_step folded into closed form: decay per step (after
    `lr_decay_after`) until the floor."""
    eff = jnp.maximum(step - tcfg.lr_decay_after, 0)
    return jnp.maximum(tcfg.lr * tcfg.lr_decay**eff, tcfg.min_lr)


def _optimizer(tcfg: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(tcfg.clip_norm),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lambda step: lr_at_step(tcfg, step)),
    )


def init_train_state(params, tcfg: TrainConfig) -> TrainState:
    opt = _optimizer(tcfg)

    # one jitted program: eagerly copying/initializing hundreds of leaves is
    # hundreds of tiny compiles on a remote-compile backend
    @jax.jit
    def _init(p):
        # copy params: the jitted train step donates its state, so the state
        # must own its buffers (callers keep their params tree valid)
        return TrainState(
            params=jax.tree_util.tree_map(jnp.copy, p),
            opt_state=opt.init(p),
            ema_params=jax.tree_util.tree_map(jnp.copy, p),
            step=jnp.zeros((), jnp.int32),
        )

    return _init(params)


def warmup(params, cfg: VAEConfig, key, data_loader, warmup_batches: int,
           max_images: int = 640):
    """Data-dependent init on `warmup_batches` stacked batches
    (mnist_train.py:557-599).  `max_images` caps the stacked batch — the init
    statistics converge long before the reference's 1600 images, and the cap
    keeps the one-off XLA compile of the DDI graph fast on remote backends."""
    stack = []
    for i, batch in enumerate(data_loader):
        stack.append(np.asarray(batch))
        if i + 1 == warmup_batches:
            break
    x = jnp.asarray(np.concatenate(stack, axis=0)[:max_images], jnp.float32)
    # jit: DDI is a few hundred eager ops — on a remote/tunneled backend each
    # eager dispatch is a round trip, so one compiled call is vastly faster
    ddi = jax.jit(lambda p, k, xx: data_dependent_init(p, cfg, k, xx))
    # keep the result on device: per-leaf host transfers are punishingly slow
    # on tunneled backends (hundreds of round trips for this pytree)
    return jax.block_until_ready(ddi(params, key, x))


def make_train_step(cfg: VAEConfig, tcfg: TrainConfig, grad_reduce=None,
                    jit_it: bool = True):
    """Returns jitted step(state, key, batch) -> (state, metrics).

    batch: (B, H, W, C) float32 raw pixels in [0, 255].
    metrics: dict of scalars (elbo b/d, recon, per-layer kl, gnorm, lr).

    grad_reduce: optional callable applied to the raw gradient pytree before
    the optimizer update — the hook the compressed-allreduce DP wrapper
    (parallel/mesh.py make_dp_train_step grad_compress) uses to psum
    bf16/f16-cast gradients inside shard_map, the reference's Horovod
    fp16-compression parity (mnist_train.py:940-943).  jit_it=False returns
    the raw body for wrapping in shard_map.
    """
    opt = _optimizer(tcfg)

    def step(state: TrainState, key, batch):
        kloss, kdrop = jax.random.split(key)

        def objective(params):
            logrecon, logdec, logenc, _ = vae_loss(
                params, cfg, kloss, batch,
                dropout_key=kdrop if cfg.dropout_p > 0 else None,
            )
            # free bits (mnist_train.py:649-650): floor each (layer, channel)
            # KL at `free_bits` bits
            kl_mat = -logdec + logenc
            kl = jnp.sum(jnp.maximum(kl_mat, tcfg.free_bits))
            elbo = (-logrecon + kl) * cfg.perdim_scale
            aux = {
                "elbo_free": elbo,
                "elbo": (-logrecon + jnp.sum(kl_mat)) * cfg.perdim_scale,
                "recon": -logrecon * cfg.perdim_scale,
                "kl_per_layer": jnp.sum(kl_mat, axis=1) * cfg.perdim_scale,
            }
            return elbo, aux

        (elbo, aux), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        if grad_reduce is not None:
            grads = grad_reduce(grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mu = tcfg.ema_on_param
        ema_params = jax.tree_util.tree_map(
            lambda p, e: mu * p + (1.0 - mu) * e, params, state.ema_params
        )
        new_state = TrainState(
            params=params, opt_state=opt_state, ema_params=ema_params,
            step=state.step + 1,
        )
        metrics = dict(aux, gnorm=gnorm, lr=lr_at_step(tcfg, state.step))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit_it else step


def make_eval_step(cfg: VAEConfig):
    """Eval uses the EMA parameters (mnist_train.py:744-746)."""

    def step(ema_params, key, batch):
        logrecon, logdec, logenc, _ = vae_loss(ema_params, cfg, key, batch)
        elbo = (-logrecon + jnp.sum(-logdec + logenc)) * cfg.perdim_scale
        return {
            "elbo": elbo,
            "recon": -logrecon * cfg.perdim_scale,
            "kl_per_layer": jnp.sum(-logdec + logenc, axis=1) * cfg.perdim_scale,
        }

    return jax.jit(step)


# ---------------------------------------------------------------------------
# checkpointing (flax serialization; the reference torch.saves state_dicts,
# mnist_train.py:805-813)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState):
    import os

    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_params(path: str, params):
    import os

    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
