"""Discretization-bin primitives.

Two bin families, as in the reference:

- `logistic_prior_bins`: equal-*mass* bins under a Logistic(mu, scale) — used
  for the top latent layer whose prior is fixed Logistic(0, 1)
  (reference `utils/torch/rand.py:78-128`, class `Bins`).
- `image_bins`: 256 equal-*width* bins for uint8 pixels mapped to [-1, 1] —
  used for the data layer (reference `rand.py:134-153`, class `ImageBins`).

Both deliberately omit the outermost ±inf endpoints; the codec accounts for
the two open tail bins by concatenating `cdf[0]` and `1 - cdf[-1]` onto the
pmf (e.g. reference `mnist_compress.py:184-185`).

Unlike the reference (which broadcasts endpoint grids to the full latent
dimension), these return minimal shapes — (nbins-1,) and (nbins,) — and let
callers broadcast; on TPU the broadcast is free inside the fused table-build.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bitswap_tpu.ops.logistic import logistic_icdf


def logistic_prior_bins(precision: int, dtype=jnp.float64, mu=0.0, scale=1.0):
    """Equal-mass bins under Logistic(mu, scale).

    Returns (endpoints, centres): endpoints has 2**precision - 1 interior
    edges at icdf(k / 2**precision), centres has 2**precision values at
    icdf((k + 0.5) / 2**precision).  Matches `Bins.endpoints/centres`
    (rand.py:96-128).
    """
    nbins = 1 << precision
    ks = jnp.arange(1, nbins, dtype=dtype)
    endpoints = logistic_icdf(ks / nbins, jnp.asarray(mu, dtype), jnp.asarray(scale, dtype))
    kc = jnp.arange(0, nbins, dtype=dtype) + 0.5
    centres = logistic_icdf(kc / nbins, jnp.asarray(mu, dtype), jnp.asarray(scale, dtype))
    return endpoints, centres


def image_bins(dtype=jnp.float64):
    """256 equal-width pixel bins on [-1, 1].

    endpoints[k] = ((k+1) - 127.5)/127.5 - 1/255 for k = 0..254 (the edge
    between pixel values k and k+1); centres[v] = (v - 127.5)/127.5 for
    v = 0..255.  Matches `ImageBins.endpoints/centres` (rand.py:143-153).
    """
    # arithmetic in numpy: IEEE-exact host math matches the reference's torch
    # doubles bit-for-bit, whereas XLA may rewrite the division by 127.5 into
    # a multiply-by-reciprocal (1-ulp drift that breaks stream byte parity)
    endpoints = (np.arange(1, 256, dtype=np.float64) - 127.5) / 127.5 - 1.0 / 255.0
    centres = (np.arange(0, 256, dtype=np.float64) - 127.5) / 127.5
    return jnp.asarray(endpoints, dtype), jnp.asarray(centres, dtype)
