"""Logistic-distribution math for the Bit-Swap codec and VAE training loss.

Pure-jnp functional equivalents of the reference's distribution layer
(`/root/reference/utils/torch/rand.py:6-72`), reworked for JAX: explicit
dtypes (the codec path wants float64 on CPU, float32 on TPU), no implicit
device state, and shapes that broadcast instead of the reference's
transpose-heavy conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def softplus(x):
    """Numerically-stable softplus: -logsigmoid(-x).

    Matches the reference's `modules.softplus` (utils/torch/modules.py:112-114),
    which is what every scale-parameterization in the model goes through.
    """
    return jax.nn.softplus(x)


def transform(eps, mu, scale):
    """Reparameterized Logistic sample: mu + scale * eps (rand.py:6-8)."""
    return mu + scale * eps


def logistic_eps(key, shape, dtype=jnp.float32, bound=1e-5):
    """Sample Logistic(0, 1) via the inverse-CDF of a clamped uniform.

    Reference: rand.py:11-20 — uniform clamped to [bound, 1-bound] then
    logit-transformed.  `bound` defaults to 1e-5 for the training loss and is
    lowered to 1e-30 by the discretization sampler (discretization.py:60,70).
    """
    u = jax.random.uniform(key, shape, dtype=dtype)
    u = jnp.clip(u, bound, 1.0 - bound)
    return jnp.log(u) - jnp.log1p(-u)


def logistic_logp(mu, scale, x):
    """Log-density of x under Logistic(mu, scale) (rand.py:23-27).

    Returns the elementwise log-density (no flattening — callers reduce).
    """
    y = -(x - mu) / scale
    return -y - jnp.log(scale) - 2.0 * softplus(-y)


def logistic_cdf(x, mu, scale):
    """CDF of Logistic(mu, scale): sigmoid((x - mu)/scale) (rand.py:67-68)."""
    return jax.nn.sigmoid((x - mu) / scale)


def logistic_icdf(p, mu, scale):
    """Quantile function of Logistic(mu, scale) (rand.py:71-72)."""
    return mu + scale * jnp.log(p / (1.0 - p))


def discretized_logistic_logp(mu, scale, x):
    """Log-pmf of uint8 pixel x under a discretized Logistic (rand.py:31-64).

    PixelCNN++-style: 256 equal-width bins on [-1, 1], closed edge bins at
    0 and 255, and a mid-bin density fallback when the CDF difference
    underflows (< 1e-5).  `x` is in [0, 255]; `mu`/`scale` live in [-1, 1]
    space.  Returns elementwise log-probabilities (callers reduce).
    """
    x_rescaled = (x - 127.5) / 127.5
    invscale = 1.0 / scale
    x_centered = x_rescaled - mu

    plus_in = invscale * (x_centered + 1.0 / 255.0)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = invscale * (x_centered - 1.0 / 255.0)
    cdf_min = jax.nn.sigmoid(min_in)

    # closed-form log-CDF at the left edge (x == 0) and log-survival at the
    # right edge (x == 255)
    log_cdf_plus = plus_in - softplus(plus_in)
    log_one_minus_cdf_min = -softplus(min_in)

    cdf_delta = cdf_plus - cdf_min
    mid_in = invscale * x_centered
    log_pdf_mid = mid_in - jnp.log(scale) - 2.0 * softplus(mid_in)

    cond1 = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        log_pdf_mid - np.log(127.5),
    )
    cond2 = jnp.where(x_rescaled > 0.999, log_one_minus_cdf_min, cond1)
    return jnp.where(x_rescaled < -0.999, log_cdf_plus, cond2)
