"""Demo file codec: container round-trip + benchmark baselines."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
from bitswap_tpu.codec.demo import (
    compress_file,
    decompress_file,
    pack_container,
    unpack_container,
)
from bitswap_tpu.codec.discretize import discretize_bins
from bitswap_tpu.models import VAEConfig, data_dependent_init, init_params


def _structured_rgb(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.float32)
    for ch in range(3):
        fx, fy = rng.uniform(0.02, 0.15, 2)
        img[:, :, ch] = 127.5 + 90 * np.sin(2 * np.pi * (fx * xx + fy * yy) + ch)
    img += rng.normal(0, 5, img.shape)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_codec():
    cfg = VAEConfig(xs=(32, 32, 3), nz=2, zchannels=2, nprocessing=1,
                    resdepth=2, reswidth=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    warm = _structured_rgb(32, 32, 0)[None].astype(np.float32)
    warm = np.repeat(warm, 16, axis=0)
    params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), jnp.asarray(warm))
    data = np.stack([_structured_rgb(32, 32, i) for i in range(32)]).astype(np.float32)
    bins = discretize_bins(params, cfg, quantbits=6, key=jax.random.PRNGKey(2),
                           data=data, batch_size=32)
    ccfg = CodecConfig(model=cfg, quantbits=6, bitswap=True,
                       init_words=512, capacity=65536)
    return make_codec(params, ccfg, bins)


def test_container_pack_roundtrip():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, size=100, dtype=np.uint32)
    head = int(rng.integers(1 << 32, (1 << 63)))
    arr = pack_container(words, head, 7, 64, 96)
    w2, h2, nb, h, w = unpack_container(arr)
    np.testing.assert_array_equal(w2, words)
    assert (h2, nb, h, w) == (head, 7, 64, 96)


def test_container_rejects_garbage(tmp_path):
    with pytest.raises(ValueError):
        unpack_container(np.zeros(3, dtype=np.uint32))
    with pytest.raises(ValueError):
        unpack_container(np.zeros(10, dtype=np.float32))


def test_demo_file_roundtrip(tiny_codec, tmp_path):
    """Full file pipeline: image -> container -> bit-exact recovery, with a
    non-multiple-of-32 image exercising the crop path."""
    from PIL import Image

    img = _structured_rgb(70, 100, 3)  # crops to 64 x 96 -> 6 blocks
    src = str(tmp_path / "photo.png")
    Image.fromarray(img).save(src)

    out = compress_file(src, out_dir=str(tmp_path), baselines=True,
                        verbose=False, codec=tiny_codec, lanes="serial")
    assert os.path.exists(out)
    # container strictly smaller than raw (random-init model won't beat PNG,
    # but must beat raw 8 b/d on smooth synthetic data... only with a trained
    # model; here just assert the container is well-formed and finite)
    words, head, nblocks, h, w = unpack_container(np.load(out))
    assert (nblocks, h, w) == (6, 64, 96)
    assert head >= 1 << 32

    rec = decompress_file(out, params=None, verify=True, verbose=False,
                          codec=tiny_codec)
    np.testing.assert_array_equal(rec, img[:64, :96])
    assert os.path.exists(str(tmp_path / "photo_recovered.png"))


def test_benchmark_compressors_roundtrippable_sizes():
    from bitswap_tpu.benchmarks.compressors import run_baselines

    imgs = [_structured_rgb(64, 64, i) for i in range(3)]
    rates = run_baselines(imgs)
    assert set(rates) == {"gzip", "bz2", "lzma", "png", "webp"}
    for name, bd in rates.items():
        assert 0 < bd < 16, (name, bd)
    # smooth gradients compress well below raw
    assert rates["png"] < 8.0


def test_demo_file_roundtrip_lane_parallel(tiny_codec, tmp_path):
    """Fast mode: one image's blocks ride lanes (T = ceil(nblocks/L) codec
    steps); container is the multi-lane format, auto-detected on decompress.
    70x135 crops to 64x128 -> 8 blocks; lanes=3 forces padding (T=3, 9
    slots) exercising the zero-block trim at reassembly."""
    from PIL import Image

    from bitswap_tpu.parallel.container import MAGIC

    img = _structured_rgb(70, 135, 5)
    src = str(tmp_path / "wide.png")
    Image.fromarray(img).save(src)

    out = compress_file(src, out_dir=str(tmp_path), baselines=False,
                        verbose=False, codec=tiny_codec, lanes=3)
    arr = np.load(out)
    assert arr[0] == MAGIC  # lane-parallel container
    rec = decompress_file(out, verify=True, verbose=False, codec=tiny_codec)
    np.testing.assert_array_equal(rec, img[:64, :128])
