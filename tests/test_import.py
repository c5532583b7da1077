"""Reference checkpoint importer: state_dict -> params pytree.

Ground truth is the reference's own torch modules (utils/torch/modules.py),
imported read-only from /root/reference: we assemble the reference Model's
exact module tree for a tiny config (same attribute names and Sequential
indices as model/mnist_train.py:85-308), randomize its parameters, import
the resulting state_dict, and assert our forward passes reproduce the torch
forwards on transposed inputs.  Skipped when the reference checkout or torch
is unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bitswap_tpu.models.vae import VAEConfig, infer_apply, generate_apply
from bitswap_tpu.tools.import_reference import import_state_dict

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "utils")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
sys.path.insert(0, REF)

from torch import nn  # noqa: E402

import utils.torch.modules as ref_modules  # noqa: E402  (reference, read-only)

CFG = VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, nprocessing=1,
                kernel_size=3, resdepth=2, reswidth=8)


def _build_reference_tree(cfg: VAEConfig, seed: int) -> nn.Module:
    """The reference Model's parameter-bearing module tree
    (model/mnist_train.py:85-308) at our test config, with randomized
    parameters."""
    m = nn.Module()
    rw, ks, zc, act = cfg.reswidth, cfg.kernel_size, cfg.zchannels, nn.ELU()
    rd = cfg.resdepths
    pad, pad5 = (ks - 1) // 2, 2
    W = ref_modules.WnConv2d
    R = ref_modules.ResNetBlock

    m.infer_in = nn.Sequential(ref_modules.Squeeze2d(2),
                               W(4 * cfg.xs[2], rw, 5, 1, pad5, loggain=True), act)
    m.infer_res0 = nn.Sequential(R(rw, rw, 5, 1, pad5, cfg.nprocessing, 0.0, act), act)
    m.infer_res1 = nn.Sequential(R(rw, rw, ks, 1, pad, rd[0], 0.0, act), act)
    m.infer_mu = W(rw, zc, ks, 1, pad)
    m.infer_std = W(rw, zc, ks, 1, pad)
    m.deepinfer_in = nn.ModuleList(
        [nn.Sequential(W(zc, rw, ks, 1, pad, loggain=True), act) for _ in range(cfg.nz - 1)])
    m.deepinfer_res = nn.ModuleList(
        [nn.Sequential(R(rw, rw, ks, 1, pad, rd[i + 1], 0.0, act), act) for i in range(cfg.nz - 1)])
    m.deepinfer_mu = nn.ModuleList(
        [nn.Sequential(W(rw, zc, ks, 1, pad)) for _ in range(cfg.nz - 1)])
    m.deepinfer_std = nn.ModuleList(
        [nn.Sequential(W(rw, zc, ks, 1, pad)) for _ in range(cfg.nz - 1)])
    m.deepgen_in = nn.ModuleList(
        [nn.Sequential(W(zc, rw, ks, 1, pad, loggain=True), act) for _ in range(cfg.nz - 1)])
    m.deepgen_res = nn.ModuleList(
        [nn.Sequential(R(rw, rw, ks, 1, pad, rd[i + 1], 0.0, act), act) for i in range(cfg.nz - 1)])
    m.deepgen_mu = nn.ModuleList(
        [nn.Sequential(W(rw, zc, ks, 1, pad)) for _ in range(cfg.nz - 1)])
    m.deepgen_std = nn.ModuleList(
        [nn.Sequential(W(rw, zc, ks, 1, pad)) for _ in range(cfg.nz - 1)])
    m.gen_in = nn.Sequential(W(zc, rw, ks, 1, pad, loggain=True), act)
    m.gen_res1 = nn.Sequential(R(rw, rw, ks, 1, pad, rd[0], 0.0, act), act)
    m.gen_res0 = nn.Sequential(R(rw, rw, 5, 1, pad5, cfg.nprocessing, 0.0, act), act)
    m.gen_mu = nn.Sequential(W(rw, 4 * cfg.xs[2], ks, 1, pad, init_scale=0.1),
                             ref_modules.UnSqueeze2d(2))
    m.gen_std = nn.Parameter(torch.zeros(cfg.xs[2], cfg.xs[0], cfg.xs[1]))

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            # keep gains positive-ish so softplus/plain parameterizations
            # both stay in a realistic regime
            p.copy_(0.3 * torch.randn(p.shape, generator=g))
    return m


@pytest.fixture(scope="module")
def imported():
    ref = _build_reference_tree(CFG, seed=7).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_state_dict(sd, CFG)
    return ref, params


class TestImport:
    def test_shapes_and_transpose(self, imported):
        ref, params = imported
        v_ref = ref.state_dict()["infer_in.1.v"].numpy()  # (O, I, kh, kw)
        assert params["infer_in"].v.shape == (5, 5, 4, CFG.reswidth)
        np.testing.assert_array_equal(
            np.asarray(params["infer_in"].v), v_ref.transpose(2, 3, 1, 0))
        np.testing.assert_array_equal(
            np.asarray(params["gen_std"]), ref.gen_std.detach().numpy().transpose(1, 2, 0))
        assert len(params["deepinfer"]) == CFG.nz - 1
        assert len(params["infer_res1"]) == CFG.resdepths[0]

    def test_missing_key_raises(self, imported):
        ref, _ = imported
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        del sd["gen_in.0.v"]
        with pytest.raises(KeyError):
            import_state_dict(sd, CFG)

    def test_infer0_forward_parity(self, imported):
        ref, params = imported
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(3, 1, 32, 32)).astype(np.float32)  # NCHW

        with torch.no_grad():
            h = ref.infer_in(torch.from_numpy(x))
            h = ref.infer_res0(h)
            h = ref.infer_res1(h)
            mu_t = ref.infer_mu(h).numpy()
            std_h = ref.infer_std(h).numpy()

        mu_j, scale_j = infer_apply(params, CFG, 0, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)
        scale_t = 0.1 + 0.9 / (1 + np.exp(-(std_h + 2.0)))  # mnist_train.py:349
        np.testing.assert_allclose(
            np.asarray(scale_j), scale_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)

    def test_infer1_forward_parity(self, imported):
        ref, params = imported
        rng = np.random.default_rng(1)
        z = rng.normal(size=(3, 1, 16, 16)).astype(np.float32)
        with torch.no_grad():
            h = ref.deepinfer_in[0](torch.from_numpy(z))
            h = ref.deepinfer_res[0](h)
            mu_t = ref.deepinfer_mu[0](h).numpy()
        mu_j, _ = infer_apply(params, CFG, 1, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)

    def test_generate0_forward_parity(self, imported):
        ref, params = imported
        rng = np.random.default_rng(2)
        z = rng.normal(size=(3, 1, 16, 16)).astype(np.float32)
        with torch.no_grad():
            h = ref.gen_in(torch.from_numpy(z))
            h = ref.gen_res1(h)
            h = ref.gen_res0(h)
            mu_t = ref.gen_mu(h).numpy()  # (B, C, 32, 32) via UnSqueeze2d
            std_t = (2.0 / 255.0) / 8.0 + np.log1p(
                np.exp(ref.gen_std.detach().numpy()))  # mnist_train.py:411
        mu_j, scale_j = generate_apply(params, CFG, 0, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(scale_j)[0], std_t.transpose(1, 2, 0), atol=2e-5, rtol=1e-4)

    def test_generate1_forward_parity(self, imported):
        ref, params = imported
        rng = np.random.default_rng(3)
        z = rng.normal(size=(3, 1, 16, 16)).astype(np.float32)
        with torch.no_grad():
            h = ref.deepgen_in[0](torch.from_numpy(z))
            h = ref.deepgen_res[0](h)
            mu_t = ref.deepgen_mu[0](h).numpy()
        mu_j, _ = generate_apply(params, CFG, 1, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(mu_j), mu_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


class TestSymbolOrder:
    def test_flatten_perm_roundtrip(self):
        from bitswap_tpu.codec.bitswap import _flatten_perm

        shape = (16, 16, 3)
        to_nchw = _flatten_perm(shape, "nhwc")
        to_nhwc = _flatten_perm(shape, "nchw")
        n = 16 * 16 * 3
        np.testing.assert_array_equal(to_nchw[to_nhwc], np.arange(n))
        # row k of an nchw table must be the (c,h,w) dimension: check against
        # an explicit NCHW flatten of a labeled volume
        vol = np.arange(n).reshape(shape)  # value = nhwc flat index
        nchw_flat = vol.transpose(2, 0, 1).ravel()
        np.testing.assert_array_equal(to_nchw, nchw_flat)

    def test_nchw_codec_roundtrip(self):
        """Full Bit-Swap round trip in NCHW symbol order (the reference's
        flatten, mnist_train.py:321-335) — self-consistency of the parity
        mode."""
        import jax

        from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
        from bitswap_tpu.codec.discretize import discretize_bins
        from bitswap_tpu.models import init_params, data_dependent_init
        from bitswap_tpu.ans.vectorized import lane_state_to_ref_lists

        cfg = VAEConfig(xs=(32, 32, 3), nz=2, zchannels=2, nprocessing=1,
                        resdepth=2, reswidth=8)
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, size=(32,) + cfg.xs).astype(np.float32)
        params = init_params(jax.random.PRNGKey(0), cfg)
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), jnp.asarray(data))
        bins = discretize_bins(params, cfg, quantbits=5, key=jax.random.PRNGKey(2),
                               data=data, batch_size=32)
        ccfg = CodecConfig(model=cfg, quantbits=5, bitswap=True, symbol_order="nchw",
                           init_words=128, capacity=16384)
        codec = make_codec(params, ccfg, bins)
        L, T = 3, 2
        x_img = rng.integers(0, 256, size=(T, L) + cfg.xs)
        xs = x_img.transpose(0, 1, 4, 2, 3).reshape(T, L, cfg.xdim).astype(np.int32)
        st0 = codec.init_state(L)
        st = codec.encode_datapoints(st0, jnp.asarray(xs))
        assert not np.any(np.asarray(st.overflow))
        st, dec = codec.decode_datapoints(st, T)
        np.testing.assert_array_equal(np.asarray(dec), xs)
        assert lane_state_to_ref_lists(st) == lane_state_to_ref_lists(st0)
