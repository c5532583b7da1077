"""ResNet layers/blocks built from weight-norm convs.

Functional equivalent of the reference's `ResNetLayer` / `ResNetBlock`
(utils/torch/modules.py:214-250): act -> conv1 -> act (-> dropout) -> conv2
+ residual, with conv2 initialized to scale 0 (plain gain, not log-space) so
every block starts as identity.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bitswap_tpu.models.wnconv import WnConvParams, wnconv_init, wnconv_apply, wnconv_ddi


class ResNetLayerParams(NamedTuple):
    conv1: WnConvParams  # loggain=True, init_scale=1.0
    conv2: WnConvParams  # loggain=False, init_scale=0.0


def resnet_layer_init(key, channels: int, kernel_size: int) -> ResNetLayerParams:
    k1, k2 = jax.random.split(key)
    return ResNetLayerParams(
        conv1=wnconv_init(k1, channels, channels, kernel_size, loggain=True),
        conv2=wnconv_init(k2, channels, channels, kernel_size, loggain=False),
    )


def resnet_layer_apply(
    params: ResNetLayerParams,
    x,
    dropout_p: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
):
    """modules.py:229-241; dropout active only when a key is supplied."""
    c1 = jax.nn.elu(wnconv_apply(params.conv1, jax.nn.elu(x), loggain=True))
    if dropout_p > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_p, c1.shape)
        c1 = jnp.where(keep, c1 / (1.0 - dropout_p), 0.0)
    c2 = wnconv_apply(params.conv2, c1, loggain=False)
    return x + c2


def resnet_layer_ddi(params: ResNetLayerParams, x):
    """Data-dependent init through the layer (no dropout in init mode)."""
    conv1, c1 = wnconv_ddi(params.conv1, jax.nn.elu(x), init_scale=1.0, loggain=True)
    c1 = jax.nn.elu(c1)
    conv2, c2 = wnconv_ddi(params.conv2, c1, init_scale=0.0, loggain=False)
    return ResNetLayerParams(conv1=conv1, conv2=conv2), x + c2


def resnet_block_init(key, channels: int, kernel_size: int, nlayers: int) -> List[ResNetLayerParams]:
    keys = jax.random.split(key, max(nlayers, 1))
    return [resnet_layer_init(keys[i], channels, kernel_size) for i in range(nlayers)]


def resnet_block_apply(layers, x, dropout_p=0.0, dropout_key=None):
    for i, lp in enumerate(layers):
        dk = None
        if dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        x = resnet_layer_apply(lp, x, dropout_p, dk)
    return x


def resnet_block_ddi(layers, x):
    new_layers = []
    for lp in layers:
        lp, x = resnet_layer_ddi(lp, x)
        new_layers.append(lp)
    return new_layers, x
