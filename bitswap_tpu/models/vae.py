"""Hierarchical conv ResNet VAE — the Bit-Swap model family, TPU-native.

Functional re-design of the reference `Model` (model/mnist_train.py:17-554
and its cifar/imagenet/imagenetcrop near-copies, parameterized here by one
config instead of four file copies).  Architecture (reference line cites in
the builders below):

  inference   x --squeeze--> conv5 --> [proc ResNet k5] --> [ResNet k3] -->
              mu/std heads  ==> q(z1|x); then per deeper layer conv3 -->
              [ResNet k3] --> mu/std heads ==> q(z_{i+1}|z_i)
  generative  mirrors symmetrically, ending in a conv3 + depth_to_space mu
              head and an unconditional (or, for the imagenetcrop variant,
              conditional conv) bottom scale.

Everything is NHWC, float32, stride-1 SAME convolutions — shapes XLA:TPU
tiles straight onto the MXU.  Layer i's full parameter set lives in one
pytree so `infer_apply(params, cfg, i, h)` is a pure jit-able function; the
codec calls it batched over stream lanes (the reference is locked to batch
size 1 in compress mode, mnist_train.py:372).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from bitswap_tpu.models.wnconv import wnconv_init, wnconv_apply, wnconv_ddi
from bitswap_tpu.models.resnet import (
    resnet_block_init,
    resnet_block_apply,
    resnet_block_ddi,
)
from bitswap_tpu.ops.logistic import (
    softplus,
    logistic_eps,
    logistic_logp,
    discretized_logistic_logp,
    transform,
)
from bitswap_tpu.ops.squeeze import space_to_depth, depth_to_space

_LOG_E_MINUS_1 = math.log(math.e - 1.0)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Model hyperparameters (reference Model.__init__ signature,
    mnist_train.py:18)."""

    xs: Tuple[int, int, int]  # (H, W, C) data shape, NHWC
    nz: int
    zchannels: int
    nprocessing: int = 4
    kernel_size: int = 3
    resdepth: int = 8
    reswidth: int = 64
    dropout_p: float = 0.0
    # imagenetcrop variant: bottom generative scale is a conv head instead of
    # a free parameter (imagenetcrop_train.py:306-315)
    conditional_bottom_scale: bool = False

    @property
    def zshape(self) -> Tuple[int, int, int]:
        # latent spatial size is always 16x16 (mnist_train.py:32)
        return (16, 16, self.zchannels)

    @property
    def zdim(self) -> int:
        return 16 * 16 * self.zchannels

    @property
    def xdim(self) -> int:
        h, w, c = self.xs
        return h * w * c

    @property
    def resdepths(self) -> Tuple[int, ...]:
        # round-robin distribution of ResNet layers over the nz latent
        # layers (mnist_train.py:66-72)
        counts = [0] * self.nz
        i = 0
        for _ in range(self.resdepth):
            i = 0 if i == self.nz else i
            counts[i] += 1
            i += 1
        return tuple(counts)

    @property
    def head_scale(self) -> float:
        # reduce initial variance as depth grows (mnist_train.py:74-76)
        return 1.0 / math.sqrt(self.nz)

    @property
    def bits_scale(self) -> float:
        return math.log2(math.e)

    @property
    def perdim_scale(self) -> float:
        return 1.0 / self.xdim


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------


def init_params(key, cfg: VAEConfig) -> Dict[str, Any]:
    """Build the full parameter pytree (pre-warmup values)."""
    h, w, c = cfg.xs
    rw, ks, zc = cfg.reswidth, cfg.kernel_size, cfg.zchannels
    rd = cfg.resdepths
    keys = iter(jax.random.split(key, 64 + 8 * cfg.nz))

    def nk():
        return next(keys)

    params: Dict[str, Any] = {}
    # <===== INFERENCE MODEL (bottom) =====> mnist_train.py:89-143
    params["infer_in"] = wnconv_init(nk(), 4 * c, rw, 5, loggain=True)
    params["infer_res0"] = resnet_block_init(nk(), rw, 5, cfg.nprocessing)
    params["infer_res1"] = resnet_block_init(nk(), rw, ks, rd[0])
    params["infer_mu"] = wnconv_init(nk(), rw, zc, ks, loggain=True)
    params["infer_std"] = wnconv_init(nk(), rw, zc, ks, loggain=True)

    # deeper inference layers, mnist_train.py:147-198
    deepinfer = []
    for i in range(cfg.nz - 1):
        deepinfer.append(
            {
                "in": wnconv_init(nk(), zc, rw, ks, loggain=True),
                "res": resnet_block_init(nk(), rw, ks, rd[i + 1]),
                "mu": wnconv_init(nk(), rw, zc, ks, loggain=True),
                "std": wnconv_init(nk(), rw, zc, ks, loggain=True),
            }
        )
    params["deepinfer"] = deepinfer

    # deeper generative layers, mnist_train.py:202-252
    deepgen = []
    for i in range(cfg.nz - 1):
        deepgen.append(
            {
                "in": wnconv_init(nk(), zc, rw, ks, loggain=True),
                "res": resnet_block_init(nk(), rw, ks, rd[i + 1]),
                "mu": wnconv_init(nk(), rw, zc, ks, loggain=True),
                "std": wnconv_init(nk(), rw, zc, ks, loggain=True),
            }
        )
    params["deepgen"] = deepgen

    # <===== GENERATIVE MODEL (bottom) =====> mnist_train.py:256-308
    params["gen_in"] = wnconv_init(nk(), zc, rw, ks, loggain=True)
    params["gen_res1"] = resnet_block_init(nk(), rw, ks, rd[0])
    params["gen_res0"] = resnet_block_init(nk(), rw, 5, cfg.nprocessing)
    params["gen_mu"] = wnconv_init(nk(), rw, 4 * c, ks, loggain=True)
    if cfg.conditional_bottom_scale:
        params["gen_std"] = wnconv_init(nk(), rw, 4 * c, ks, loggain=True)
    else:
        params["gen_std"] = jnp.zeros((h, w, c), jnp.float32)
    return params


def param_count(params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(int(p.size) for p in leaves if hasattr(p, "size"))


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------


def infer_apply(params, cfg: VAEConfig, i: int, given, dropout_key=None):
    """q(z_{i+1} | ·) parameters: (mu, scale), each (B, 16, 16, zc).

    `given` is x scaled to [-1, 1] (shape (B, H, W, C)) for i == 0, else
    z_i of shape (B, 16, 16, zc).  Mirrors Model.infer (mnist_train.py:
    315-379) minus the compress-mode flattening, which lives in the codec.
    """
    dp, dk = cfg.dropout_p, dropout_key
    if i == 0:
        h = space_to_depth(given, 2)
        h = jax.nn.elu(wnconv_apply(params["infer_in"], h))
        h = jax.nn.elu(resnet_block_apply(params["infer_res0"], h, dp, _fold(dk, 0)))
        h = jax.nn.elu(resnet_block_apply(params["infer_res1"], h, dp, _fold(dk, 1)))
        mu = wnconv_apply(params["infer_mu"], h)
        scale = 0.1 + 0.9 * jax.nn.sigmoid(wnconv_apply(params["infer_std"], h) + 2.0)
    else:
        lp = params["deepinfer"][i - 1]
        h = jax.nn.elu(wnconv_apply(lp["in"], given))
        h = jax.nn.elu(resnet_block_apply(lp["res"], h, dp, _fold(dk, 2)))
        mu = wnconv_apply(lp["mu"], h)
        scale = 0.1 + 0.9 * jax.nn.sigmoid(wnconv_apply(lp["std"], h) + 2.0)
    return mu, scale


def generate_apply(params, cfg: VAEConfig, i: int, given, dropout_key=None):
    """p(z_{i-1} | z_i) / p(x | z_1) parameters (Model.generate,
    mnist_train.py:382-438).  For i == 0 returns (mu, scale) of shape
    (B, H, W, C); scale broadcasts from the unconditional parameter unless
    the config uses the conditional head."""
    dp, dk = cfg.dropout_p, dropout_key
    if i == 0:
        h = jax.nn.elu(wnconv_apply(params["gen_in"], given))
        h = jax.nn.elu(resnet_block_apply(params["gen_res1"], h, dp, _fold(dk, 3)))
        h = jax.nn.elu(resnet_block_apply(params["gen_res0"], h, dp, _fold(dk, 4)))
        mu = depth_to_space(wnconv_apply(params["gen_mu"], h), 2)
        floor = (2.0 / 255.0) / 8.0
        if cfg.conditional_bottom_scale:
            scale = floor + softplus(depth_to_space(wnconv_apply(params["gen_std"], h), 2))
        else:
            scale = floor + softplus(params["gen_std"])
            scale = jnp.broadcast_to(scale, mu.shape)
    else:
        lp = params["deepgen"][i - 1]
        h = jax.nn.elu(wnconv_apply(lp["in"], given))
        h = jax.nn.elu(resnet_block_apply(lp["res"], h, dp, _fold(dk, 5)))
        mu = wnconv_apply(lp["mu"], h)
        scale = 0.1 + 0.9 * softplus(wnconv_apply(lp["std"], h) + _LOG_E_MINUS_1)
    return mu, scale


def _fold(key, i):
    return None if key is None else jax.random.fold_in(key, i)


# ---------------------------------------------------------------------------
# training loss
# ---------------------------------------------------------------------------


def loss(params, cfg: VAEConfig, key, x, dropout_key=None):
    """ELBO components in bits, matching Model.loss (mnist_train.py:441-490).

    x: (B, H, W, C) raw pixels in [0, 255] (float32).
    Returns (logrecon, logdec, logenc, zsamples):
      logrecon: scalar — batch-mean reconstruction log-lik (bits)
      logdec:   (nz, zchannels) — batch-mean generative log-liks (bits)
      logenc:   (nz, zchannels) — batch-mean posterior log-liks (bits)
      zsamples: (nz, B, 16, 16, zc) latent samples
    """
    batch = x.shape[0]
    zc = cfg.zchannels
    logenc_rows: List[jnp.ndarray] = []
    logdec_rows: List[Optional[jnp.ndarray]] = [None] * cfg.nz
    zsamples = []

    given = (x - 127.5) / 127.5
    z = None
    logrecon = None
    for i in range(cfg.nz):
        mu, scale = infer_apply(params, cfg, i, given if i == 0 else z, dropout_key)
        eps = logistic_eps(jax.random.fold_in(key, i), mu.shape, dtype=mu.dtype)
        z_next = transform(eps, mu, scale)
        zsamples.append(z_next)
        # sum log q over spatial dims -> (B, zc)
        logq = jnp.sum(logistic_logp(mu, scale, z_next), axis=(1, 2))
        logenc_rows.append(logq)

        mu, scale = generate_apply(params, cfg, i, z_next, dropout_key)
        if i == 0:
            logp = jnp.sum(
                discretized_logistic_logp(mu, scale, x), axis=(1, 2, 3)
            )  # (B,)
            logrecon = logp
        else:
            logp = jnp.sum(logistic_logp(mu, scale, z), axis=(1, 2))
            logdec_rows[i - 1] = logp
        z = z_next

    # top prior Logistic(0, 1) (mnist_train.py:483-484)
    logp = jnp.sum(logistic_logp(jnp.zeros((), x.dtype), jnp.ones((), x.dtype), z), axis=(1, 2))
    logdec_rows[cfg.nz - 1] = logp

    bits = cfg.bits_scale
    logenc = jnp.stack([jnp.mean(r, axis=0) for r in logenc_rows]) * bits  # (nz, zc)
    logdec = jnp.stack([jnp.mean(r, axis=0) for r in logdec_rows]) * bits
    logrecon = jnp.mean(logrecon) * bits
    return logrecon, logdec, logenc, jnp.stack(zsamples)


def elbo_bits_per_dim(logrecon, logdec, logenc, cfg: VAEConfig):
    """-ELBO in bits/dim (the reference's reporting unit, mnist_train.py:583)."""
    elbo = -logrecon + jnp.sum(-logdec + logenc)
    return elbo * cfg.perdim_scale


def loss_per_sample(params, cfg: VAEConfig, key, x):
    """Per-sample -ELBO in bits/dim, (B,).  The codec drivers log this next
    to the actual net coded bits per datapoint (mnist_compress.py:170-174,
    258-259) — coding overhead D = net - elbo is the continuous accuracy
    metric."""
    given = (x - 127.5) / 127.5
    z = None
    total = jnp.zeros((x.shape[0],), x.dtype)
    for i in range(cfg.nz):
        mu, scale = infer_apply(params, cfg, i, given if i == 0 else z)
        eps = logistic_eps(jax.random.fold_in(key, i), mu.shape, dtype=mu.dtype)
        z_next = transform(eps, mu, scale)
        total += jnp.sum(logistic_logp(mu, scale, z_next), axis=(1, 2, 3))  # logq
        mu, scale = generate_apply(params, cfg, i, z_next)
        if i == 0:
            total -= jnp.sum(discretized_logistic_logp(mu, scale, x), axis=(1, 2, 3))
        else:
            total -= jnp.sum(logistic_logp(mu, scale, z), axis=(1, 2, 3))
        z = z_next
    total -= jnp.sum(
        logistic_logp(jnp.zeros((), x.dtype), jnp.ones((), x.dtype), z), axis=(1, 2, 3)
    )
    return total * cfg.bits_scale * cfg.perdim_scale


# ---------------------------------------------------------------------------
# data-dependent initialization (warmup pass)
# ---------------------------------------------------------------------------


def data_dependent_init(params, cfg: VAEConfig, key, x):
    """One init pass through the full model, updating every WnConv's
    gain/bias from batch statistics — the functional counterpart of running
    the reference's `model.loss` under `init_mode()` (mnist_train.py:575-576).

    Follows the exact same compute path as `loss` (ancestral bottom-up with
    reparameterized samples) so the statistics match the reference's.
    Returns the updated parameter pytree.
    """
    p = dict(params)
    p["deepinfer"] = [dict(d) for d in params["deepinfer"]]
    p["deepgen"] = [dict(d) for d in params["deepgen"]]
    scale_b = cfg.head_scale
    bottom_head_scale = scale_b if cfg.nz > 1 else math.sqrt(2.0) * scale_b

    given = (x - 127.5) / 127.5
    z = None
    for i in range(cfg.nz):
        # --- inference layer i ---
        if i == 0:
            h = space_to_depth(given, 2)
            p["infer_in"], h = wnconv_ddi(p["infer_in"], h, init_scale=1.0)
            h = jax.nn.elu(h)
            p["infer_res0"], h = resnet_block_ddi(p["infer_res0"], h)
            h = jax.nn.elu(h)
            p["infer_res1"], h = resnet_block_ddi(p["infer_res1"], h)
            h = jax.nn.elu(h)
            p["infer_mu"], mu = wnconv_ddi(p["infer_mu"], h, init_scale=bottom_head_scale)
            p["infer_std"], sh = wnconv_ddi(p["infer_std"], h, init_scale=bottom_head_scale)
        else:
            lp = p["deepinfer"][i - 1]
            lp["in"], h = wnconv_ddi(lp["in"], z, init_scale=1.0)
            h = jax.nn.elu(h)
            lp["res"], h = resnet_block_ddi(lp["res"], h)
            h = jax.nn.elu(h)
            # head scale: sqrt(2)*scale on the top layer (mnist_train.py:184)
            hs = scale_b if (i - 1) < cfg.nz - 2 else math.sqrt(2.0) * scale_b
            lp["mu"], mu = wnconv_ddi(lp["mu"], h, init_scale=hs)
            lp["std"], sh = wnconv_ddi(lp["std"], h, init_scale=hs)
        scale = 0.1 + 0.9 * jax.nn.sigmoid(sh + 2.0)
        eps = logistic_eps(jax.random.fold_in(key, i), mu.shape, dtype=mu.dtype)
        z_next = transform(eps, mu, scale)

        # --- generative layer i (statistics flow top-down through the same
        # sample, as the reference's single loss pass does) ---
        if i == 0:
            h = z_next
            p["gen_in"], h = wnconv_ddi(p["gen_in"], h, init_scale=1.0)
            h = jax.nn.elu(h)
            p["gen_res1"], h = resnet_block_ddi(p["gen_res1"], h)
            h = jax.nn.elu(h)
            p["gen_res0"], h = resnet_block_ddi(p["gen_res0"], h)
            h = jax.nn.elu(h)
            p["gen_mu"], _ = wnconv_ddi(p["gen_mu"], h, init_scale=0.1)
            if cfg.conditional_bottom_scale:
                p["gen_std"], _ = wnconv_ddi(p["gen_std"], h, init_scale=0.1)
        else:
            lp = p["deepgen"][i - 1]
            lp["in"], h = wnconv_ddi(lp["in"], z_next, init_scale=1.0)
            h = jax.nn.elu(h)
            lp["res"], h = resnet_block_ddi(lp["res"], h)
            h = jax.nn.elu(h)
            lp["mu"], _ = wnconv_ddi(lp["mu"], h, init_scale=scale_b)
            lp["std"], _ = wnconv_ddi(lp["std"], h, init_scale=scale_b)
        z = z_next
    return p
