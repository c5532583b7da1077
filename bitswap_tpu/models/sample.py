"""Ancestral sampling and reconstruction grids.

Counterpart of Model.sample / Model.reconstruct (mnist_train.py:493-554):
unconditional samples flow top-down through the generative chain; the
reconstruction encodes one inference step then decodes back down.  Pixel
means in [-1, 1] are mapped to uint8 via the same (x*127.5 + 127.5) scaling
the reference uses.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.models.vae import VAEConfig, generate_apply, infer_apply
from bitswap_tpu.ops.logistic import logistic_eps, transform


def sample_images(params, cfg: VAEConfig, key, n: int) -> np.ndarray:
    """Unconditional samples: (n, H, W, C) uint8 (mnist_train.py:493-518)."""

    def fn(params, key):
        z = logistic_eps(jax.random.fold_in(key, cfg.nz), (n,) + cfg.zshape)
        for i in range(cfg.nz - 1, 0, -1):
            mu, scale = generate_apply(params, cfg, i, z)
            eps = logistic_eps(jax.random.fold_in(key, i), mu.shape, dtype=mu.dtype)
            z = transform(eps, mu, scale)
        mu, _ = generate_apply(params, cfg, 0, z)
        return mu

    mu = jax.jit(fn)(params, key)
    return _to_u8(mu)


def reconstruct_images(params, cfg: VAEConfig, key, x_u8: np.ndarray) -> np.ndarray:
    """Posterior-sample reconstruction of raw uint8 images
    (mnist_train.py:521-554): one inference step to z1, then the bottom
    generative mean."""

    def fn(params, key, x):
        given = (x - 127.5) / 127.5
        mu, scale = infer_apply(params, cfg, 0, given)
        eps = logistic_eps(key, mu.shape, dtype=mu.dtype)
        z = transform(eps, mu, scale)
        mu, _ = generate_apply(params, cfg, 0, z)
        return mu

    mu = jax.jit(fn)(params, key, jnp.asarray(x_u8, jnp.float32))
    return _to_u8(mu)


def _to_u8(mu) -> np.ndarray:
    arr = np.asarray(jnp.clip(mu * 127.5 + 127.5, 0, 255)).astype(np.uint8)
    return arr


def image_grid(images: np.ndarray, ncol: int = 0) -> np.ndarray:
    """Tile (N, H, W, C) into one (rows*H, ncol*W, C) grid image."""
    n, h, w, c = images.shape
    ncol = ncol or int(math.ceil(math.sqrt(n)))
    nrow = int(math.ceil(n / ncol))
    grid = np.zeros((nrow * h, ncol * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid
