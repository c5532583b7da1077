"""Hierarchical VAE tests: shapes, data-dependent init statistics, ELBO
plausibility, gradients, and the architecture bookkeeping."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.models import (
    VAEConfig,
    init_params,
    data_dependent_init,
    infer_apply,
    generate_apply,
    vae_loss,
    param_count,
)
from bitswap_tpu.models.vae import elbo_bits_per_dim

SMALL = VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, nprocessing=2, resdepth=2, reswidth=8)
RGB = VAEConfig(xs=(32, 32, 3), nz=3, zchannels=8, nprocessing=1, resdepth=3, reswidth=16)


def _data(cfg, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 256, size=(batch,) + cfg.xs).astype(np.float32)
    )


class TestArchitecture:
    def test_resdepth_round_robin(self):
        assert VAEConfig(xs=(32, 32, 1), nz=8, zchannels=1, resdepth=8).resdepths == (1,) * 8
        assert VAEConfig(xs=(32, 32, 1), nz=4, zchannels=1, resdepth=8).resdepths == (2, 2, 2, 2)
        assert VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, resdepth=8).resdepths == (4, 4)
        assert VAEConfig(xs=(32, 32, 1), nz=3, zchannels=1, resdepth=8).resdepths == (3, 3, 2)

    def test_param_count_matches_formula(self):
        # every WnConv contributes k*k*cin*cout + 2*cout; gen_std adds xs
        cfg = SMALL
        params = init_params(jax.random.PRNGKey(0), cfg)

        def conv(cin, cout, k):
            return k * k * cin * cout + 2 * cout

        rw, ks, zc, c = cfg.reswidth, cfg.kernel_size, cfg.zchannels, cfg.xs[2]
        rd = cfg.resdepths
        res = lambda k, n: n * (conv(rw, rw, k) * 2)
        want = (
            conv(4 * c, rw, 5) + res(5, cfg.nprocessing) + res(ks, rd[0])
            + 2 * conv(rw, zc, ks)  # infer heads
            + (cfg.nz - 1) * (conv(zc, rw, ks) + res(ks, rd[1]) + 2 * conv(rw, zc, ks))  # deepinfer
            + (cfg.nz - 1) * (conv(zc, rw, ks) + res(ks, rd[1]) + 2 * conv(rw, zc, ks))  # deepgen
            + conv(zc, rw, ks) + res(ks, rd[0]) + res(5, cfg.nprocessing)
            + conv(rw, 4 * c, ks) + int(np.prod(cfg.xs))
        )
        assert param_count(params) == want


class TestForward:
    @pytest.mark.parametrize("cfg", [SMALL, RGB], ids=["mnist-like", "rgb"])
    def test_shapes(self, cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = _data(cfg)
        xin = (x - 127.5) / 127.5
        mu, scale = infer_apply(params, cfg, 0, xin)
        assert mu.shape == scale.shape == (4,) + cfg.zshape
        assert np.all(np.asarray(scale) > 0.1 - 1e-6) and np.all(np.asarray(scale) < 1.0)
        z = mu
        for i in range(1, cfg.nz):
            mu, scale = infer_apply(params, cfg, i, z)
            assert mu.shape == (4,) + cfg.zshape
        for i in reversed(range(1, cfg.nz)):
            mu, scale = generate_apply(params, cfg, i, z)
            assert mu.shape == (4,) + cfg.zshape
            assert np.all(np.asarray(scale) > 0.1 - 1e-6)
        mu, scale = generate_apply(params, cfg, 0, z)
        assert mu.shape == (4,) + cfg.xs
        assert scale.shape == mu.shape
        assert np.all(np.asarray(scale) >= (2.0 / 255.0) / 8.0 - 1e-9)

    def test_conditional_bottom_scale_variant(self):
        cfg = VAEConfig(
            xs=(32, 32, 3), nz=2, zchannels=8, nprocessing=1, resdepth=2, reswidth=8,
            conditional_bottom_scale=True,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (2,) + cfg.zshape, dtype=jnp.float32)
        mu, scale = generate_apply(params, cfg, 0, z)
        assert scale.shape == mu.shape == (2,) + cfg.xs
        # conditional: scale varies with input
        z2 = z + 1.0
        _, scale2 = generate_apply(params, cfg, 0, z2)
        assert not np.allclose(np.asarray(scale), np.asarray(scale2))


class TestDataDependentInit:
    def test_wnconv_ddi_reference_semantics(self):
        # replicate modules.py:75-96 by hand: y from the OLD gain, then
        # gain <- clamp(log(init_scale/(std+eps)), -10) and b -= m*s.
        # (Note the reference's loggain init is deliberately approximate:
        # the post-init forward uses softplus(log s) = log(1+s), not s.)
        from bitswap_tpu.models.wnconv import wnconv_init, wnconv_apply, wnconv_ddi

        key = jax.random.PRNGKey(3)
        p0 = wnconv_init(key, 4, 6, 3, loggain=True)
        x = jax.random.normal(jax.random.PRNGKey(4), (16, 8, 8, 4), dtype=jnp.float32)
        y = np.asarray(wnconv_apply(p0, x, loggain=True))
        m = y.mean(axis=(0, 1, 2))
        s = 0.7 / (y.std(axis=(0, 1, 2), ddof=1) + 1e-10)
        p1, y1 = wnconv_ddi(p0, x, init_scale=0.7, loggain=True)
        np.testing.assert_allclose(
            np.asarray(p1.gain), np.maximum(np.log(s), -10.0), rtol=1e-3
        )
        np.testing.assert_allclose(np.asarray(p1.b), np.asarray(p0.b) - m * s, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(wnconv_apply(p1, x, loggain=True)), rtol=1e-6
        )

    def test_plain_gain_ddi_normalizes_exactly(self):
        # loggain=False layers (ResNet conv2) set gain = s directly, so the
        # post-init output really is normalized
        from bitswap_tpu.models.wnconv import wnconv_init, wnconv_ddi

        p0 = wnconv_init(jax.random.PRNGKey(5), 4, 6, 3, loggain=False)
        x = jax.random.normal(jax.random.PRNGKey(6), (16, 8, 8, 4), dtype=jnp.float32)
        p1, y1 = wnconv_ddi(p0, x, init_scale=0.5, loggain=False)
        y1 = np.asarray(y1)
        np.testing.assert_allclose(y1.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(y1.std(axis=(0, 1, 2), ddof=1), 0.5, rtol=1e-3)

    def test_resnet_identity_at_init(self):
        # conv2 has init_scale=0, so ResNet layers are exact identities after
        # DDI up to the zero-gain second conv
        cfg = SMALL
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = _data(cfg, batch=32, seed=3)
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(4), x)
        for layer in params["infer_res0"]:
            assert np.allclose(np.asarray(layer.conv2.gain), 0.0, atol=1e-6)


class TestLoss:
    @pytest.mark.parametrize("cfg", [SMALL, RGB], ids=["mnist-like", "rgb"])
    def test_elbo_finite_and_plausible(self, cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = _data(cfg, batch=16, seed=5)
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), x)
        logrecon, logdec, logenc, zs = vae_loss(params, cfg, jax.random.PRNGKey(2), x)
        assert logdec.shape == logenc.shape == (cfg.nz, cfg.zchannels)
        assert zs.shape == (cfg.nz, 16) + cfg.zshape
        bpd = float(elbo_bits_per_dim(logrecon, logdec, logenc, cfg))
        # random data: can't beat ~8 bits/dim by much, shouldn't explode either
        assert np.isfinite(bpd)
        assert 4.0 < bpd < 60.0

    def test_grads_flow_everywhere(self):
        cfg = SMALL
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = _data(cfg, batch=8, seed=6)
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), x)

        def objective(p):
            logrecon, logdec, logenc, _ = vae_loss(p, cfg, jax.random.PRNGKey(2), x)
            return elbo_bits_per_dim(logrecon, logdec, logenc, cfg)

        grads = jax.grad(objective)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        assert all(np.all(np.isfinite(np.asarray(g))) for _, g in flat)
        # At init every residual branch is identically zero (conv2.gain == 0,
        # init_scale=0 — modules.py:227), so ResNet conv1.* and conv2.v grads
        # are structurally zero, exactly as in the reference.  Everything
        # else must receive gradient.
        for path, g in flat:
            k = jax.tree_util.keystr(path)
            in_res_branch = "res" in k and (("conv1" in k) or ("conv2.v" in k))
            if not in_res_branch:
                assert float(jnp.sum(jnp.abs(g))) > 0, f"dead gradient at {k}"

    def test_loss_jits(self):
        cfg = SMALL
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = _data(cfg, batch=4, seed=7)
        f = jax.jit(lambda p, k, d: vae_loss(p, cfg, k, d))
        logrecon, _, _, _ = f(params, jax.random.PRNGKey(1), x)
        assert np.isfinite(float(logrecon))
