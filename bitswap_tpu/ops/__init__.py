from bitswap_tpu.ops.logistic import (
    logistic_cdf,
    logistic_icdf,
    logistic_logp,
    logistic_eps,
    discretized_logistic_logp,
    softplus,
    transform,
)
from bitswap_tpu.ops.bins import logistic_prior_bins, image_bins
from bitswap_tpu.ops.squeeze import space_to_depth, depth_to_space

__all__ = [
    "logistic_cdf",
    "logistic_icdf",
    "logistic_logp",
    "logistic_eps",
    "discretized_logistic_logp",
    "softplus",
    "transform",
    "logistic_prior_bins",
    "image_bins",
    "space_to_depth",
    "depth_to_space",
]
