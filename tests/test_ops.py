"""Distribution math & bin tests (ops layer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from bitswap_tpu.ops import (
    logistic_cdf,
    logistic_icdf,
    logistic_logp,
    logistic_eps,
    discretized_logistic_logp,
    logistic_prior_bins,
    image_bins,
    space_to_depth,
    depth_to_space,
)


class TestLogistic:
    def test_cdf_icdf_inverse(self):
        p = jnp.linspace(0.01, 0.99, 50, dtype=jnp.float64)
        x = logistic_icdf(p, 0.3, 1.7)
        np.testing.assert_allclose(np.asarray(logistic_cdf(x, 0.3, 1.7)), np.asarray(p), rtol=1e-12)

    def test_cdf_matches_scipy(self):
        x = np.linspace(-10, 10, 101)
        got = np.asarray(logistic_cdf(jnp.asarray(x), 0.5, 2.0))
        want = stats.logistic.cdf(x, loc=0.5, scale=2.0)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_logp_matches_scipy(self):
        x = np.linspace(-8, 8, 101)
        got = np.asarray(logistic_logp(jnp.float64(0.5), jnp.float64(2.0), jnp.asarray(x)))
        want = stats.logistic.logpdf(x, loc=0.5, scale=2.0)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_eps_distribution(self):
        # the sampler clamps the uniform to [1e-5, 1-1e-5] (rand.py:16), so
        # compare moments and quartiles rather than exact tail behaviour
        eps = np.asarray(logistic_eps(jax.random.PRNGKey(0), (200_000,), dtype=jnp.float64))
        assert abs(np.mean(eps)) < 0.02
        assert np.var(eps) == pytest.approx(np.pi**2 / 3, rel=0.03)
        np.testing.assert_allclose(
            np.quantile(eps, [0.25, 0.5, 0.75]),
            stats.logistic.ppf([0.25, 0.5, 0.75]),
            atol=0.02,
        )

    def test_discretized_logp_sums_to_one(self):
        # across the full 0..255 support the pmf must sum to 1
        xs = jnp.arange(256, dtype=jnp.float64)
        for mu, scale in [(0.0, 0.1), (0.5, 0.03), (-0.97, 0.2), (0.999, 0.01)]:
            logps = discretized_logistic_logp(jnp.float64(mu), jnp.float64(scale), xs)
            total = float(jnp.sum(jnp.exp(logps)))
            assert total == pytest.approx(1.0, abs=1e-6), (mu, scale)

    def test_discretized_logp_edge_cases_finite(self):
        xs = jnp.asarray([0.0, 255.0])
        logps = discretized_logistic_logp(jnp.float64(0.9999), jnp.float64(1e-4), xs)
        assert np.all(np.isfinite(np.asarray(logps)))


class TestBins:
    def test_prior_bins_equal_mass(self):
        endpoints, centres = logistic_prior_bins(4)
        # mass between consecutive endpoints under Logistic(0,1) is 1/16
        cdfvals = np.asarray(logistic_cdf(endpoints, 0.0, 1.0))
        np.testing.assert_allclose(np.diff(cdfvals), 1 / 16, atol=1e-12)
        assert endpoints.shape == (15,) and centres.shape == (16,)
        # centres at half-mass points
        np.testing.assert_allclose(
            np.asarray(logistic_cdf(centres, 0.0, 1.0)), (np.arange(16) + 0.5) / 16, atol=1e-12
        )

    def test_image_bins_match_reference_formula(self):
        endpoints, centres = image_bins()
        # reference rand.py:143-153
        want_e = ((np.arange(1, 256) - 127.5) / 127.5) - 1.0 / 255.0
        want_c = (np.arange(0, 256) - 127.5) / 127.5
        np.testing.assert_allclose(np.asarray(endpoints), want_e, atol=1e-12)
        np.testing.assert_allclose(np.asarray(centres), want_c, atol=1e-12)
        # endpoints sit halfway between centres
        np.testing.assert_allclose(np.asarray(endpoints), (want_c[:-1] + want_c[1:]) / 2, atol=1e-12)


class TestSqueeze:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
        y = space_to_depth(x, 2)
        assert y.shape == (2, 4, 4, 12)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, 2)), np.asarray(x))

    def test_channel_order_matches_reference(self):
        # reference Squeeze2d on NCHW: out channel index = c*4 + fh*2 + fw
        # (modules.py:183-185); verify via a hand-built tensor
        x = np.zeros((1, 2, 2, 3), np.float32)
        for fh in range(2):
            for fw in range(2):
                for c in range(3):
                    x[0, fh, fw, c] = 100 * c + 10 * fh + fw
        y = np.asarray(space_to_depth(jnp.asarray(x), 2))[0, 0, 0]
        for c in range(3):
            for fh in range(2):
                for fw in range(2):
                    assert y[c * 4 + fh * 2 + fw] == 100 * c + 10 * fh + fw
