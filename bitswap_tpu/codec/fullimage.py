"""Blockwise full-size-image compression sweep — the imagenetcrop driver.

Equivalent of `imagenetcrop_compress.py:245-314`: for each valid test image,
crop to 32-multiples, extract 32x32 blocks, and compare classical
compressors (gzip/bz2/lzma/PNG/WebP) against BB-ANS and Bit-Swap over the
block sequence.  The reference codes one image's blocks serially through one
ANS state with batch-1 model passes (:122-128); here each image is one lane
of the lane-parallel codec, so a whole batch of images is coded
simultaneously — images are independent (fresh state per lane), which is
the natural data-parallel axis (SURVEY.md §3.4).

Images are grouped by block count per codec call, so every scan step is
dense (no per-lane validity masking).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from bitswap_tpu.codec.blocks import extract_blocks


@dataclasses.dataclass
class FullImageResult:
    rates: Dict[str, float]  # scheme -> mean bits/dim
    per_image: Dict[str, np.ndarray]
    n_images: int

    def summary(self) -> str:
        lines = [f"{self.n_images} images:"]
        for name, v in sorted(self.rates.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<10} {v:6.3f} bits/dim")
        return "\n".join(lines)


def _codec_bits_for_group(
    images: Sequence[np.ndarray], bitswap: bool, params, table_dtype: str,
    data_dir: str, codec=None,
) -> np.ndarray:
    """Bit-Swap/BB-ANS bits/dim for a group of images with EQUAL block
    counts, coded as parallel lanes.

    Metric semantics follow imagenetcrop_compress.py:210-213 exactly:
    totalbits = (len(state) - (len(restbits) - 1)) * 32 — the final stream
    (words + 1 head element) measured against the `restbits` snapshot taken
    after the first block's initial decode(s), so unconsumed initial bits
    are discounted but the head word is charged."""
    import jax.numpy as jnp

    from bitswap_tpu.codec.demo import _build_codec, _INIT_WORDS

    blocks_per_img = [extract_blocks(img, (32, 32))[0] for img in images]
    nblocks = blocks_per_img[0].shape[0]
    assert all(b.shape[0] == nblocks for b in blocks_per_img)
    L = len(images)

    if codec is None:
        codec, _ = _build_codec(params=params, table_dtype=table_dtype,
                                data_dir=data_dir, bitswap=bitswap,
                                capacity=_INIT_WORDS + nblocks * 3072)
    cfg = codec.ccfg.model

    # (T=nblocks, L, xdim)
    xs = np.stack(
        [b.reshape(nblocks, cfg.xdim) for b in blocks_per_img], axis=1
    ).astype(np.int32)
    state0 = codec.init_state(L, seed=100)
    xs_dev = jnp.asarray(xs)
    rest_sp = np.asarray(codec.rest_sp(state0, xs_dev[0]))  # restbits snapshot
    state = codec.encode_datapoints(state0, xs_dev)
    assert not np.any(np.asarray(state.overflow)), "stream buffer overflow"
    # (len(state) - (len(restbits) - 1)) * 32 with len(·) = words + 1 head
    total_words = np.asarray(state.sp) + 1 - rest_sp
    dims = np.asarray([b.size for b in blocks_per_img], dtype=np.float64)
    return total_words * 32.0 / dims


def run_fullimage_benchmark(
    image_paths: Sequence[str],
    n_images: int = 100,
    params=None,
    schemes: Sequence[str] = ("gzip", "bz2", "lzma", "png", "webp", "bbans", "bitswap"),
    seed: int = 100,
    table_dtype: str = "float32",
    data_dir: str = "data",
    verbose: bool = True,
    codecs: Optional[Dict[str, object]] = None,  # scheme -> prebuilt Codec
) -> FullImageResult:
    """Sample up to `n_images` valid RGB images and benchmark every scheme.

    Mirrors the reference's sweep (imagenetcrop_compress.py:252-305: seed-100
    sample of candidates, skip non-3-channel / too-small images, report mean
    bits/dim per scheme)."""
    from PIL import Image

    from bitswap_tpu.benchmarks.compressors import ALL_COMPRESSORS

    rng = np.random.RandomState(seed)
    order = rng.choice(len(image_paths), size=len(image_paths), replace=False)

    valid: List[np.ndarray] = []
    for i in order:
        if len(valid) >= n_images:
            break
        try:
            arr = np.asarray(Image.open(image_paths[i]), dtype=np.uint8)
        except Exception:
            continue
        if arr.ndim != 3 or arr.shape[2] != 3:
            continue  # reference skips non-RGB (imagenetcrop_compress.py:283-285)
        if arr.shape[0] < 32 or arr.shape[1] < 32:
            continue
        h = arr.shape[0] - arr.shape[0] % 32
        w = arr.shape[1] - arr.shape[1] % 32
        valid.append(arr[:h, :w])
    if not valid:
        raise ValueError("no valid RGB images >= 32x32 found")

    per_image: Dict[str, np.ndarray] = {}
    classical = [s for s in schemes if s in ALL_COMPRESSORS]
    for name in classical:
        fn = ALL_COMPRESSORS[name]
        per_image[name] = np.asarray([fn(img) / img.size for img in valid])

    for scheme in ("bbans", "bitswap"):
        if scheme not in schemes:
            continue
        # group by block count so every lane group scans densely
        groups: Dict[int, List[int]] = {}
        for idx, img in enumerate(valid):
            nb = (img.shape[0] // 32) * (img.shape[1] // 32)
            groups.setdefault(nb, []).append(idx)
        rates = np.zeros(len(valid))
        for nb, idxs in sorted(groups.items()):
            imgs = [valid[i] for i in idxs]
            r = _codec_bits_for_group(imgs, scheme == "bitswap", params,
                                      table_dtype, data_dir,
                                      codec=(codecs or {}).get(scheme))
            rates[idxs] = r
            if verbose:
                print(f"  {scheme}: {len(idxs)} images x {nb} blocks -> "
                      f"{r.mean():.3f} b/d")
        per_image[scheme] = rates

    rates = {name: float(v.mean()) for name, v in per_image.items()}
    result = FullImageResult(rates=rates, per_image=per_image, n_images=len(valid))
    if verbose:
        print(result.summary())
    return result


def main(argv=None) -> int:
    import argparse
    import glob

    p = argparse.ArgumentParser(
        prog="bitswap_tpu.codec.fullimage",
        description="Full-size-image compression benchmark (imagenetcrop_compress.py)",
    )
    p.add_argument("image_dir", help="directory of test images")
    p.add_argument("--n-images", type=int, default=100)
    p.add_argument("--seed", type=int, default=100)
    args = p.parse_args(argv)
    paths = sorted(
        sum((glob.glob(os.path.join(args.image_dir, pat))
             for pat in ("*.png", "*.jpg", "*.jpeg", "*.JPEG")), [])
    )
    run_fullimage_benchmark(paths, n_images=args.n_images, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
