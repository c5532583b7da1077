"""Weight-normalized 2-D convolution with data-dependent initialization.

Functional JAX equivalent of the reference's `WnConv2d`
(utils/torch/modules.py:57-109): weight w = v * g / ||v||, with the gain
stored in log-space (passed through softplus) when `loggain` is set, and a
one-shot data-dependent init pass that sets gain/bias so the layer's outputs
over an init batch have std `init_scale` and mean 0.

Differences from the reference are layout-only: NHWC activations and HWIO
kernels (what XLA:TPU tiles onto the MXU best), and the init pass is an
explicit pure function `ddi` returning updated params instead of a mutating
global `init_mode()` flag — idiomatic for jit-compiled functional updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bitswap_tpu.ops.logistic import softplus

_WN_INIT_STDV = 0.05  # modules.py:12
_SMALL = 1e-10  # modules.py:13


class WnConvParams(NamedTuple):
    v: jnp.ndarray  # (kh, kw, in_dim, out_dim) direction
    gain: jnp.ndarray  # (out_dim,) gain (log-space iff loggain)
    b: jnp.ndarray  # (out_dim,) bias


def wnconv_init(key, in_dim: int, out_dim: int, kernel_size: int, loggain: bool = True):
    """Pre-warmup parameters (modules.py:68-73): v ~ N(0, 0.05), gain zeros
    (log-space) or ones, bias zeros."""
    v = _WN_INIT_STDV * jax.random.normal(
        key, (kernel_size, kernel_size, in_dim, out_dim), dtype=jnp.float32
    )
    gain = jnp.zeros((out_dim,), jnp.float32) if loggain else jnp.ones((out_dim,), jnp.float32)
    return WnConvParams(v=v, gain=gain, b=jnp.zeros((out_dim,), jnp.float32))


def _weight(params: WnConvParams, loggain: bool):
    g = softplus(params.gain) if loggain else params.gain
    vnorm = jnp.sqrt(jnp.sum(jnp.square(params.v), axis=(0, 1, 2)))
    return params.v * (g / (vnorm + _SMALL))


def wnconv_apply(params: WnConvParams, x, loggain: bool = True):
    """Same-size stride-1 convolution in NHWC (modules.py:98-106).

    All convolutions in the Bit-Swap model family are stride 1 with
    symmetric (k-1)/2 padding, i.e. SAME.
    """
    w = _weight(params, loggain)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params.b


def wnconv_ddi(params: WnConvParams, x, init_scale: float, loggain: bool = True):
    """Data-dependent init (modules.py:75-96): run the unnormalized forward,
    then set gain and bias so per-channel outputs have mean 0 and std
    `init_scale`.  Returns (new_params, normalized_forward_output)."""
    y = wnconv_apply(params, x, loggain)
    # per-out-channel stats over (B, H, W); ddof=1 matches torch std()
    m = jnp.mean(y, axis=(0, 1, 2))
    n = y.shape[0] * y.shape[1] * y.shape[2]
    var = jnp.sum(jnp.square(y - m), axis=(0, 1, 2)) / max(n - 1, 1)
    s = init_scale / (jnp.sqrt(var) + _SMALL)
    if loggain:
        gain = jnp.maximum(jnp.log(s), -10.0)
    else:
        gain = s
    b = params.b - m * s
    new_params = WnConvParams(v=params.v, gain=gain, b=b)
    return new_params, wnconv_apply(new_params, x, loggain)
