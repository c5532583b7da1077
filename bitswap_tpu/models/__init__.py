from bitswap_tpu.models.vae import (
    VAEConfig,
    init_params,
    data_dependent_init,
    infer_apply,
    generate_apply,
    loss as vae_loss,
    param_count,
)

__all__ = [
    "VAEConfig",
    "init_params",
    "data_dependent_init",
    "infer_apply",
    "generate_apply",
    "vae_loss",
    "param_count",
]
