"""Latent-space discretization-bin construction.

TPU-native re-design of the reference's `discretize()` (discretization.py:
9-117): build per-(layer, dimension) bin tables for coding the continuous
latents with a finite-alphabet entropy coder.

- Top layer: analytic equal-mass bins under the fixed Logistic(0, 1) prior
  (discretization.py:25-27) — no sampling needed.
- Lower layers: empirical.  Draw ppb=30 samples per bin ancestrally from the
  generative model top-down AND from the inference model bottom-up on real
  data (discretization.py:64-78), then fit equal-width bins per dimension
  between the per-dimension sample min/max — exactly what sklearn's
  KBinsDiscretizer(strategy='uniform') computes (discretization.py:105-117),
  but as a 10-line vectorized jnp reduction instead of a per-dimension
  sklearn fit loop.

The sampling runs batched and jitted on device; samples are held in float16
(as the reference does, discretization.py:59-61) to bound memory.  Results
are cached to .npz keyed by (dataset tag, nz, quantbits).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bitswap_tpu.models.vae import VAEConfig, infer_apply, generate_apply
from bitswap_tpu.ops.logistic import logistic_eps, transform
from bitswap_tpu.ops.bins import logistic_prior_bins

PPB = 30  # samples per bin (discretization.py:11)


class DiscretizationBins(NamedTuple):
    """zendpoints: (nz, zdim, 2**qb - 1); zcentres: (nz, zdim, 2**qb).

    `order` records the flatten order of the zdim rows: "nhwc" (canonical,
    what discretize_bins produces from the (16, 16, zc) latent) or "nchw"
    (the reference's flatten, what import_reference_bins yields).  The codec
    permutes rows when its symbol order differs.
    """

    zendpoints: np.ndarray
    zcentres: np.ndarray
    order: str = "nhwc"

    @property
    def quantbits(self) -> int:
        return int(np.log2(self.zcentres.shape[-1]))


def uniform_bins_from_samples(samples, nbins: int):
    """Equal-width bins between per-dimension min and max.

    samples: (N, zdim).  Returns (endpoints (zdim, nbins-1),
    centres (zdim, nbins)).  Matches KBinsDiscretizer(strategy='uniform'):
    edges = linspace(min, max, nbins+1), centres = edge midpoints,
    interior endpoints = edges[1:-1] (discretization.py:110-117).
    """
    vmin = jnp.min(samples, axis=0)  # (zdim,)
    vmax = jnp.max(samples, axis=0)
    ks = jnp.arange(1, nbins, dtype=samples.dtype) / nbins  # (nbins-1,)
    endpoints = vmin[:, None] + (vmax - vmin)[:, None] * ks[None, :]
    edges_lo = jnp.concatenate([vmin[:, None], endpoints], axis=1)
    edges_hi = jnp.concatenate([endpoints, vmax[:, None]], axis=1)
    centres = (edges_lo + edges_hi) / 2.0
    return endpoints, centres


def discretize_bins(
    params,
    cfg: VAEConfig,
    quantbits: int,
    key,
    data,
    cache_path: Optional[str] = None,
    batch_size: int = 128,
) -> DiscretizationBins:
    """Build (or load cached) discretization bins.

    data: (N, H, W, C) raw pixels in [0, 255] used for the inference-side
    chains; recycled if shorter than the required sample count, like the
    reference's dataset concatenation (discretization.py:52-53).
    """
    if cache_path is not None and os.path.exists(cache_path):
        with np.load(cache_path) as f:
            return DiscretizationBins(zendpoints=f["zendpoints"], zcentres=f["zcentres"])

    nz, zdim = cfg.nz, cfg.zdim
    nbins = 1 << quantbits
    nsamples = PPB * nbins
    batches = int(np.ceil(nsamples / batch_size))

    zendpoints = np.zeros((nz, zdim, nbins - 1), np.float64)
    zcentres = np.zeros((nz, zdim, nbins), np.float64)

    # top layer: analytic bins under the Logistic(0,1) prior
    e, c = logistic_prior_bins(quantbits, dtype=jnp.float64)
    zendpoints[nz - 1] = np.broadcast_to(np.asarray(e), (zdim, nbins - 1))
    zcentres[nz - 1] = np.broadcast_to(np.asarray(c), (zdim, nbins))

    if nz == 1:
        out = DiscretizationBins(zendpoints=zendpoints, zcentres=zcentres)
        _maybe_save(cache_path, out)
        return out

    # --- empirical layers ---
    # (fallback-path steps; the fast path runs _scan_chain_jit, a
    # module-level jitted driver so repeated builds reuse the trace)
    gen_step = jax.jit(
        lambda p, k, z, zi: _gen_sample(p, cfg, k, z, zi), static_argnums=(3,)
    )
    inf_step = jax.jit(
        lambda p, k, g, zi: _inf_sample(p, cfg, k, g, zi), static_argnums=(3,)
    )

    data = np.asarray(data, np.float32)
    ndata = data.shape[0]

    # float16 sample stores, (nz-1 needed layers kept; top gen layer is the
    # prior eps itself)
    gen_samples = np.zeros((nz, nsamples, zdim), np.float16)
    k0, key = jax.random.split(key)
    gen_samples[nz - 1] = np.asarray(
        logistic_eps(k0, (nsamples, zdim), dtype=jnp.float32, bound=1e-30), np.float16
    )
    inf_samples = np.zeros((nz - 1, nsamples, zdim), np.float16)

    # Chains run as ONE jitted scan per (layer, chain) with a single
    # device->host fetch per layer: the per-batch dispatch+fetch loop is
    # fetch-bound on tunneled backends (~2*(nz-1)*nsamples/batch round
    # trips; 28 minutes for a cifar-class nz=8 build vs ~2 with the scan).
    # The scan reproduces the loop's key-split sequence exactly, so cached
    # bins stay byte-identical; the loop remains as the fallback for ragged
    # batch splits (nsamples % batch_size != 0, only in tiny-qb tests).
    fast = nsamples % batch_size == 0

    def scan_chain(which, key, given_flat, zi, is_x):
        """given_flat: (nsamples, ...) device/np input; returns (key, (nsamples, zdim) np.f16)."""
        nb = nsamples // batch_size
        giv = jnp.asarray(given_flat).reshape((nb, batch_size) + given_flat.shape[1:])
        key, outs = _scan_chain_jit(cfg, which, zi, is_x, params, key, giv)
        return key, np.asarray(outs, np.float16).reshape(nsamples, zdim)

    for zi in reversed(range(1, nz)):
        kinf = nz - zi - 1
        if fast:
            # generative chain: z_{zi} -> z_{zi-1}
            giv = gen_samples[zi].astype(np.float32).reshape((nsamples,) + cfg.zshape)
            key, gen_samples[zi - 1] = scan_chain("gen", key, giv, zi, False)
            # inference chain: layer (nz - zi - 1), bottom-up on data
            if kinf == 0:
                giv = data[np.arange(nsamples) % ndata]
                key, inf_samples[0] = scan_chain("inf", key, giv, 0, True)
            else:
                giv = inf_samples[kinf - 1].astype(np.float32).reshape((nsamples,) + cfg.zshape)
                key, inf_samples[kinf] = scan_chain("inf", key, giv, kinf, False)
            continue
        for bi in range(batches):
            sl = slice(bi * batch_size, min((bi + 1) * batch_size, nsamples))
            key, k = jax.random.split(key)
            z = jnp.asarray(gen_samples[zi][sl], jnp.float32).reshape((-1,) + cfg.zshape)
            out = gen_step(params, k, z, zi)
            gen_samples[zi - 1][sl] = np.asarray(out, np.float16).reshape(sl.stop - sl.start, zdim)
        for bi in range(batches):
            sl = slice(bi * batch_size, min((bi + 1) * batch_size, nsamples))
            key, k = jax.random.split(key)
            if kinf == 0:
                idx = (np.arange(sl.start, sl.stop)) % ndata
                given = jnp.asarray(data[idx])
                given = (given - 127.5) / 127.5
            else:
                given = jnp.asarray(inf_samples[kinf - 1][sl], jnp.float32).reshape(
                    (-1,) + cfg.zshape
                )
            out = inf_step(params, k, given, kinf)
            inf_samples[kinf][sl] = np.asarray(out, np.float16).reshape(sl.stop - sl.start, zdim)

    for zi in range(nz - 1):
        samples = np.concatenate(
            [gen_samples[zi].astype(np.float64), inf_samples[zi].astype(np.float64)], axis=0
        )
        e, c = uniform_bins_from_samples(jnp.asarray(samples), nbins)
        zendpoints[zi] = np.asarray(e)
        zcentres[zi] = np.asarray(c)

    out = DiscretizationBins(zendpoints=zendpoints, zcentres=zcentres)
    _maybe_save(cache_path, out)
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _scan_chain_jit(cfg: VAEConfig, which: str, zi: int, is_x: bool, params, key, giv):
    """One whole sampling chain layer as a jitted scan over batches.

    Module-level (cached by jax.jit on the static (cfg, which, zi, is_x)
    key) so repeated bin builds — and the gen/inf chains of one build —
    reuse the trace instead of retracing per call.  The body reproduces the
    fallback loop's key-split sequence exactly: cached bins stay
    byte-identical (tests/test_discretize_fast.py pins this).
    """
    step = _gen_sample if which == "gen" else _inf_sample

    def body(k, gb):
        k, kb = jax.random.split(k)
        if is_x:
            gb = (gb.astype(jnp.float32) - 127.5) / 127.5
        out = step(params, cfg, kb, gb, zi)
        return k, out.reshape(gb.shape[0], cfg.zdim)

    return jax.lax.scan(body, key, giv)


def _gen_sample(params, cfg, key, z, zi):
    mu, scale = generate_apply(params, cfg, zi, z)
    eps = logistic_eps(key, mu.shape, dtype=mu.dtype, bound=1e-30)
    return transform(eps, mu, scale)


def _inf_sample(params, cfg, key, given, zi):
    mu, scale = infer_apply(params, cfg, zi, given)
    eps = logistic_eps(key, mu.shape, dtype=mu.dtype, bound=1e-30)
    return transform(eps, mu, scale)


def _maybe_save(cache_path, bins: DiscretizationBins):
    if cache_path is not None:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, zendpoints=bins.zendpoints, zcentres=bins.zcentres)
