"""Dataset / model configuration registry.

Replaces the reference's four near-copy train scripts and six codec scripts
worth of hard-coded constants (e.g. mnist_compress.py:71-88,
cifar_compress.py:71-87, imagenetcrop_compress.py:85-105) with one table.

reswidth is coupled to nz to keep parameter counts comparable across depths,
exactly as the reference's checkpoints were trained (README.md:144-193).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

from bitswap_tpu.models.vae import VAEConfig

# reference reswidth tables (mnist_compress.py:81-88, cifar_compress.py:80-87)
_MNIST_WIDTH = {8: 61, 4: 62, 2: 63, 1: 64}
_RGB_WIDTH = {8: 252, 4: 254, 2: 255, 1: 256}


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    xs: Tuple[int, int, int]  # NHWC
    zchannels: int
    default_nz: int
    # training defaults (reference argparse defaults, mnist_train.py:832-848)
    batch_size: int = 128
    lr: float = 2e-3
    lr_decay: float = 0.9995
    dropout_p: float = 0.2
    # ImageNet variants only decay the lr after 100k steps
    # (imagenet_train.py:824)
    lr_decay_after: int = 0

    def model_config(self, nz: int, dropout_p: float | None = None) -> VAEConfig:
        width = (_MNIST_WIDTH if self.xs[2] == 1 else _RGB_WIDTH)[nz]
        return VAEConfig(
            xs=self.xs,
            nz=nz,
            zchannels=self.zchannels,
            nprocessing=4,
            kernel_size=3,
            resdepth=8,
            reswidth=width,
            dropout_p=self.dropout_p if dropout_p is None else dropout_p,
            conditional_bottom_scale=(self.name == "imagenetcrop"),
        )


DATASETS: Dict[str, DatasetSpec] = {
    # MNIST is padded 28->32 (mnist_compress.py:129)
    "mnist": DatasetSpec(name="mnist", xs=(32, 32, 1), zchannels=1, default_nz=8),
    "cifar": DatasetSpec(name="cifar", xs=(32, 32, 3), zchannels=8, default_nz=8),
    "imagenet": DatasetSpec(
        name="imagenet", xs=(32, 32, 3), zchannels=8, default_nz=4, lr_decay_after=100_000
    ),
    "imagenetcrop": DatasetSpec(
        name="imagenetcrop", xs=(32, 32, 3), zchannels=8, default_nz=4, lr_decay_after=100_000
    ),
}


def get_spec(name: str) -> DatasetSpec:
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)}")
    return DATASETS[name]
