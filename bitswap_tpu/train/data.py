"""Dataset loading.

The reference pulls MNIST/CIFAR via torchvision downloads and ImageNet32
from preconverted .npy files (utils/torch/modules.py:253-269,
model/create_imagenet.py).  This environment has no network egress and no
torchvision, so:

- real data is loaded from `data/{name}/{split}.npy` (uint8, NHWC or NHW)
  when present — the same single-array container the reference's ImageNet
  path uses;
- otherwise a deterministic synthetic generator produces structured,
  compressible images so every pipeline (training, discretization, codec,
  benchmarks) runs end-to-end.  Synthetic data is clearly labeled in
  benchmark output.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np


def synthetic_images(n: int, shape: Tuple[int, int, int], seed: int) -> np.ndarray:
    """Structured, learnable images: mixtures of smooth oriented waves,
    blobs, and mild sensor-like noise, quantized to uint8.  (N, H, W, C)."""
    rng = np.random.default_rng(seed)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.empty((n, h, w, c), np.uint8)
    for i in range(n):
        nwaves = rng.integers(1, 4)
        img = np.zeros((h, w), np.float32)
        for _ in range(nwaves):
            fx, fy = rng.uniform(-0.25, 0.25, 2)
            phase = rng.uniform(0, 2 * np.pi)
            img += rng.uniform(20, 60) * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        # a blob
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(3, w / 2)
        img += rng.uniform(-80, 80) * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
        img += 127.5
        for ch in range(c):
            chan = img + rng.normal(0, 4, (h, w)) + rng.uniform(-25, 25)
            out[i, :, :, ch] = np.clip(np.round(chan), 0, 255)
    return out


def load_dataset(
    name: str,
    split: str,
    shape: Tuple[int, int, int],
    data_dir: str = "data",
    synthetic_n: int = 2048,
) -> Tuple[np.ndarray, bool]:
    """Returns (images uint8 (N, H, W, C), is_synthetic)."""
    path = os.path.join(data_dir, name, f"{split}.npy")
    if os.path.exists(path):
        arr = np.load(path)
        if arr.ndim == 3:  # grayscale (N, H, W)
            arr = arr[..., None]
        assert arr.dtype == np.uint8, arr.dtype
        h, w, c = shape
        if arr.shape[1] < h or arr.shape[2] < w:  # e.g. MNIST 28 -> pad to 32
            ph = (h - arr.shape[1]) // 2
            pw = (w - arr.shape[2]) // 2
            arr = np.pad(arr, ((0, 0), (ph, h - arr.shape[1] - ph), (pw, w - arr.shape[2] - pw), (0, 0)))
        assert arr.shape[1:] == shape, (arr.shape, shape)
        return arr, False
    seed = {"train": 1234, "test": 4321}.get(split, 99)
    return synthetic_images(synthetic_n, shape, seed), True


def dataset_is_padded(name: str, shape: Tuple[int, int, int], data_dir: str = "data") -> bool:
    """True iff REAL data exists and is stored smaller than `shape` (e.g.
    MNIST 28x28 padded to the 32x32 model frame, mnist_compress.py:129).
    Published rates are rescaled to the ORIGINAL dim count only in that case
    (reference plots/cma.py:28-31); synthetic data is generated natively at
    `shape`, so its rates must NOT be rescaled."""
    path = os.path.join(data_dir, name, "test.npy")
    if not os.path.exists(path):
        return False
    arr = np.load(path, mmap_mode="r")
    return arr.shape[1] < shape[0] or arr.shape[2] < shape[1]


def batch_iterator(
    data: np.ndarray, batch_size: int, key_seed: int, shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Simple epoch iterator yielding float32 [0,255] NHWC batches."""
    n = data.shape[0]
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(key_seed).shuffle(idx)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        yield data[idx[s : s + batch_size]].astype(np.float32)
