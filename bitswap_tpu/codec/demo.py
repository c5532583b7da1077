"""End-user file codec: compress/decompress arbitrary images with Bit-Swap.

Equivalent of the reference's `demo_compress.py` / `demo_decompress.py`:
an image file is cropped to 32-multiples, split into 32x32 blocks, and the
block sequence is Bit-Swap coded through one ANS stream with the
imagenetcrop-class model (nz=4, reswidth=256, conditional bottom scale).

Two container formats, auto-detected on decompress:

- **serial** (`lanes="serial"`, mirroring demo_compress.py:273-284): one
  stream, `[stream words..., head_lo, head_hi, nblocks, h, w]` — the
  reference-layout parity mode, blocks coded sequentially as in
  demo_compress.py:122-137.
- **lane-parallel** (`lanes="auto"` default, or an int): one image's blocks
  ride L lanes of the vectorized coder simultaneously — T = ceil(nblocks/L)
  coding steps instead of nblocks — serialized with the deterministic
  multi-lane container (parallel/container.py, meta = [nblocks, h, w]);
  recognizable by its magic word.

The `excess_state_len` trick (demo_compress.py:113-160) is kept in both:
initializer words below the minimum stack depth reached during coding are
never consumed by either direction, so they are simply omitted from the
container (per lane in the parallel format).

Decompression (demo_decompress.py:69-148) mirrors the sender in reverse,
reassembles the blocks, verifies bit-exactness against the uncompressed
`.npy` the compressor saved alongside (demo_decompress.py:234-236), and
writes a recovered image.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from bitswap_tpu.codec.blocks import extract_blocks, unextract_blocks

_CONTAINER_SUFFIX = "_bitswap.npy"
_QUANTBITS = 10
_NZ = 4
_INIT_WORDS = 10000


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _build_codec(params=None, table_dtype: str = "float32", data_dir: str = "data",
                 capacity: int = 1 << 20, bitswap: bool = True):
    """Model + bins + codec for the demo config (demo_compress.py:85-105:
    imagenetcrop checkpoint, nz=4, quantbits=10)."""
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import data_dependent_init, init_params
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params
    from bitswap_tpu.utils.registry import get_spec

    spec = get_spec("imagenetcrop")
    cfg = spec.model_config(_NZ, dropout_p=0.0)
    train_data, _ = load_dataset("imagenetcrop", "train", cfg.xs, data_dir)
    if params is None:
        params = init_params(jax.random.PRNGKey(0), cfg)
        warm = jnp.asarray(train_data[:256].astype(np.float32))
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), warm)
        ckpt = os.path.join("params", "imagenetcrop", f"nz{_NZ}.msgpack")
        if os.path.exists(ckpt):
            params = load_params(ckpt, params)
    bins = discretize_bins(
        params, cfg, _QUANTBITS, jax.random.PRNGKey(2), data=train_data,
        cache_path=os.path.join("bins", f"imagenetcrop_nz{_NZ}_qb{_QUANTBITS}.npz"),
    )
    ccfg = CodecConfig(model=cfg, quantbits=_QUANTBITS, bitswap=bitswap,
                       table_dtype=table_dtype, init_words=_INIT_WORDS,
                       capacity=capacity)
    return make_codec(params, ccfg, bins), cfg


def pack_container(words: np.ndarray, head: int, nblocks: int, h: int, w: int) -> np.ndarray:
    """Serialize a coded stream into the uint32 container layout."""
    trailer = np.asarray(
        [head & 0xFFFFFFFF, head >> 32, nblocks, h, w], dtype=np.uint32
    )
    return np.concatenate([np.asarray(words, dtype=np.uint32), trailer])


def unpack_container(arr: np.ndarray) -> Tuple[np.ndarray, int, int, int, int]:
    """Inverse of pack_container -> (words, head, nblocks, h, w)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint32 or arr.ndim != 1 or arr.size < 5:
        raise ValueError("not a bitswap_tpu container (need a flat uint32 array)")
    w = int(arr[-1]); h = int(arr[-2]); nblocks = int(arr[-3])
    head = (int(arr[-4]) << 32) | int(arr[-5])
    return arr[:-5].copy(), head, nblocks, h, w


def _pick_lanes(nblocks: int, lanes) -> int:
    """Lane count for the parallel mode: enough lanes to keep the coder's
    128-wide vector units busy without padding small images excessively."""
    if lanes == "auto":
        return min(nblocks, 256)
    L = int(lanes)
    assert L >= 1
    return min(nblocks, L)


def compress_file(
    image_path: str,
    out_dir: Optional[str] = None,
    params=None,
    baselines: bool = True,
    verbose: bool = True,
    codec=None,
    lanes="auto",
) -> str:
    """Compress an image file; returns the container path.

    Also writes `<name>_uncompressed.npy` (the cropped raw pixels the
    decompressor verifies against, demo_compress.py:268-270) and, when
    `baselines`, the gzip/bz2/lzma/PNG/WebP versions plus a size report
    (demo_compress.py:287-333).
    """
    import jax.numpy as jnp

    arr = _load_image(image_path)
    old_h, old_w = arr.shape[:2]
    blocks, h, w = extract_blocks(arr, (32, 32))
    cropped = arr[:h, :w]
    nblocks = blocks.shape[0]

    dirname = out_dir or os.path.dirname(os.path.abspath(image_path))
    stem = os.path.splitext(os.path.basename(image_path))[0]
    os.makedirs(dirname, exist_ok=True)
    np.save(os.path.join(dirname, f"{stem}_uncompressed"), cropped)

    L = 1 if lanes == "serial" else _pick_lanes(nblocks, lanes)
    T = -(-nblocks // L)
    if codec is None:
        codec, _ = _build_codec(params=params, capacity=_INIT_WORDS + T * 3072)
    cfg = codec.ccfg.model
    assert blocks.shape[1:] == cfg.xs, f"blocks {blocks.shape[1:]} vs model {cfg.xs}"

    flat = blocks.reshape(nblocks, cfg.xdim).astype(np.int32)
    if T * L != nblocks:  # pad with zero blocks; trimmed at reassembly
        flat = np.concatenate(
            [flat, np.zeros((T * L - nblocks, cfg.xdim), np.int32)])
    xs = flat.reshape(T, L, cfg.xdim)  # block index = t*L + l
    state0 = codec.init_state(L, seed=100)
    state, min_sp = codec.encode_datapoints_with_min_sp(state0, jnp.asarray(xs))
    assert not np.any(np.asarray(state.overflow)), "stream buffer overflow"

    if lanes == "serial":
        sp = int(np.asarray(state.sp)[0])
        trim = int(np.asarray(min_sp)[0])  # words never consumed (excess_state_len)
        buf = np.asarray(state.buf)[0, :sp]
        head = (int(np.asarray(state.hi)[0]) << 32) | int(np.asarray(state.lo)[0])
        container = pack_container(buf[trim:], head, nblocks, h, w)
    else:
        from bitswap_tpu.parallel.container import pack_lanes

        container = pack_lanes(state, trim=np.asarray(min_sp),
                               meta=(nblocks, h, w))

    out_path = os.path.join(dirname, f"{stem}_bitswap")
    np.save(out_path, container)
    out_path += ".npy"

    report = [("raw (cropped)", cropped.size * 8)]
    report.append(("bitswap", os.path.getsize(out_path) * 8))
    if baselines:
        from bitswap_tpu.benchmarks.compressors import ALL_COMPRESSORS

        for name, fn in ALL_COMPRESSORS.items():
            report.append((name, fn(cropped)))
    if verbose:
        print(f"{image_path}: ({old_h}, {old_w}, 3)"
              + (f" cropped to ({h}, {w}, 3)" if (h, w) != (old_h, old_w) else "")
              + f", {nblocks} blocks")
        width = max(len(n) for n, _ in report)
        for name, bits in report:
            print(f"  {name:<{width}}  {bits:>12d} bits  "
                  f"{bits / cropped.size:6.3f} bits/dim")
    return out_path


def decompress_file(
    container_path: str,
    out_path: Optional[str] = None,
    params=None,
    verify: bool = True,
    verbose: bool = True,
    codec=None,
) -> np.ndarray:
    """Decompress a container back to pixels; writes `<stem>_recovered.png`
    and verifies bit-exactness against `<stem>_uncompressed.npy` when
    present (demo_decompress.py:234-240)."""
    import jax

    if not container_path.endswith(_CONTAINER_SUFFIX):
        raise ValueError(f"expected a {_CONTAINER_SUFFIX} container: {container_path}")
    arr = np.load(container_path)

    from bitswap_tpu.parallel.container import MAGIC, unpack_lanes

    if arr.size >= 1 and arr[0] == MAGIC:  # lane-parallel container
        if codec is None:
            codec, _ = _build_codec(params=params)
        cfg = codec.ccfg.model
        state, meta = unpack_lanes(arr)  # capacity from the container itself
        nblocks, h, w = int(meta[0]), int(meta[1]), int(meta[2])
        L = state.num_lanes
        T = -(-nblocks // L)
        state, xs = codec.decode_datapoints(state, T)
        jax.block_until_ready(xs)
        flat = np.asarray(xs).reshape(T * L, cfg.xdim)[:nblocks]
    else:  # serial reference-layout container
        words, head, nblocks, h, w = unpack_container(arr)
        if codec is None:
            codec, _ = _build_codec(params=params,
                                    capacity=_INIT_WORDS + nblocks * 3072)
        cfg = codec.ccfg.model

        from bitswap_tpu.ans.vectorized import lane_state_from_ref_lists

        state = lane_state_from_ref_lists(
            [list(map(int, words)) + [head]], capacity=codec.ccfg.capacity
        )
        state, xs = codec.decode_datapoints(state, nblocks)
        jax.block_until_ready(xs)
        flat = np.asarray(xs).reshape(nblocks, cfg.xdim)
    blocks = flat.reshape(nblocks, 32, 32, cfg.xs[2]).astype(np.uint8)
    img = unextract_blocks(blocks, h, w)

    stem = container_path[: -len(_CONTAINER_SUFFIX)]
    if verify:
        ref_path = stem + "_uncompressed.npy"
        if os.path.exists(ref_path):
            ref = np.load(ref_path)
            assert np.array_equal(img, ref), "round-trip mismatch with original pixels"
            if verbose:
                print("verified: bit-exact round trip")
        elif verbose:
            print(f"no {ref_path}; skipping bit-exact verification")

    from PIL import Image

    rec = out_path or (stem + "_recovered.png")
    Image.fromarray(img if img.shape[2] > 1 else img[:, :, 0]).save(rec)
    if verbose:
        print(f"recovered image -> {rec}")
    return img


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="bitswap_tpu.codec.demo",
        description="Bit-Swap file compressor/decompressor (demo_compress.py / demo_decompress.py)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compress")
    c.add_argument("image")
    c.add_argument("--out-dir", default=None)
    c.add_argument("--no-baselines", action="store_true")
    c.add_argument("--lanes", default="auto",
                   help="'auto' (lane-parallel), 'serial' (reference-layout "
                        "container), or a lane count")
    d = sub.add_parser("decompress")
    d.add_argument("container")
    d.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.cmd == "compress":
        lanes = args.lanes if args.lanes in ("auto", "serial") else int(args.lanes)
        compress_file(args.image, out_dir=args.out_dir,
                      baselines=not args.no_baselines, lanes=lanes)
    else:
        decompress_file(args.container, out_path=args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
