"""Tests for particles_tpu.distributions.

Oracle strategy (SURVEY.md §4): log-pdfs and quantile functions are checked
against scipy.stats (host-side, float64) at a float32-appropriate tolerance;
samplers are checked by moments; StructDist by chain-rule identities.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import particles_tpu.distributions as dists

XS = np.array([0.1, 0.5, 0.9, 1.5, 2.5], dtype=np.float32)
US = np.array([0.05, 0.25, 0.5, 0.75, 0.95], dtype=np.float32)


def check_logpdf(d, oracle, x, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(d.logpdf(jnp.asarray(x))), oracle.logpdf(x), atol=atol, rtol=1e-4
    )


def check_ppf(d, oracle, u=US, atol=1e-3):
    np.testing.assert_allclose(
        np.asarray(d.ppf(jnp.asarray(u))), oracle.ppf(u), atol=atol, rtol=1e-3
    )


class TestContinuousLogpdfAndPpf:
    def test_normal(self):
        d = dists.Normal(loc=1.0, scale=2.0)
        check_logpdf(d, st.norm(1.0, 2.0), XS)
        check_ppf(d, st.norm(1.0, 2.0))

    def test_logistic(self):
        d = dists.Logistic(loc=0.5, scale=1.5)
        check_logpdf(d, st.logistic(0.5, 1.5), XS)
        check_ppf(d, st.logistic(0.5, 1.5))

    def test_laplace(self):
        d = dists.Laplace(loc=0.5, scale=1.5)
        check_logpdf(d, st.laplace(0.5, 1.5), XS)
        check_ppf(d, st.laplace(0.5, 1.5))

    def test_beta(self):
        d = dists.Beta(a=2.0, b=3.0)
        x = np.array([0.1, 0.4, 0.8], dtype=np.float32)
        check_logpdf(d, st.beta(2.0, 3.0), x)
        check_ppf(d, st.beta(2.0, 3.0))

    def test_gamma(self):
        d = dists.Gamma(a=2.0, b=3.0)
        check_logpdf(d, st.gamma(2.0, scale=1 / 3.0), XS)
        check_ppf(d, st.gamma(2.0, scale=1 / 3.0))

    def test_invgamma(self):
        d = dists.InvGamma(a=3.0, b=2.0)
        check_logpdf(d, st.invgamma(3.0, scale=2.0), XS)
        check_ppf(d, st.invgamma(3.0, scale=2.0), atol=5e-3)

    def test_lognormal(self):
        d = dists.LogNormal(mu=0.5, sigma=0.8)
        check_logpdf(d, st.lognorm(0.8, scale=np.exp(0.5)), XS)
        check_ppf(d, st.lognorm(0.8, scale=np.exp(0.5)))

    def test_uniform(self):
        d = dists.Uniform(a=-1.0, b=3.0)
        check_logpdf(d, st.uniform(-1.0, 4.0), XS)
        check_ppf(d, st.uniform(-1.0, 4.0))
        assert np.asarray(d.logpdf(jnp.float32(5.0))) == -np.inf

    def test_student(self):
        d = dists.Student(df=4.0, loc=0.5, scale=2.0)
        check_logpdf(d, st.t(4.0, 0.5, 2.0), XS)
        check_ppf(d, st.t(4.0, 0.5, 2.0), atol=5e-3)

    def test_truncnormal(self):
        d = dists.TruncNormal(mu=0.5, sigma=1.0, a=0.0, b=2.0)
        oracle = st.truncnorm(-0.5, 1.5, loc=0.5, scale=1.0)
        x = np.array([0.1, 0.5, 1.0, 1.9], dtype=np.float32)
        check_logpdf(d, oracle, x)
        check_ppf(d, oracle)
        assert np.asarray(d.logpdf(jnp.float32(2.5))) == -np.inf

    def test_dirac_and_flat(self):
        d = dists.Dirac(loc=2.0)
        x = d.rvs(jax.random.key(0), size=5)
        assert np.all(np.asarray(x) == 2.0)
        assert np.asarray(d.logpdf(jnp.float32(2.0))) == 0.0
        assert np.asarray(d.logpdf(jnp.float32(1.0))) == -np.inf
        f = dists.FlatNormal(loc=0.0)
        assert np.all(np.asarray(f.logpdf(jnp.ones(3))) == 0.0)
        assert np.all(np.isnan(np.asarray(f.rvs(jax.random.key(0), size=3))))


class TestSamplers:
    @pytest.mark.parametrize(
        "d,mean,var",
        [
            (dists.Normal(loc=1.0, scale=2.0), 1.0, 4.0),
            (dists.Gamma(a=2.0, b=3.0), 2 / 3.0, 2 / 9.0),
            (dists.Beta(a=2.0, b=2.0), 0.5, 0.05),
            (dists.Laplace(loc=0.0, scale=1.0), 0.0, 2.0),
            (dists.Logistic(loc=0.0, scale=1.0), 0.0, np.pi**2 / 3),
            (dists.Uniform(a=0.0, b=2.0), 1.0, 1 / 3.0),
            (dists.LogNormal(mu=0.0, sigma=0.5), np.exp(0.125), None),
            (dists.Student(df=10.0), 0.0, 10 / 8.0),
            (dists.InvGamma(a=4.0, b=3.0), 1.0, None),
        ],
    )
    def test_moments(self, d, mean, var):
        x = np.asarray(d.rvs(jax.random.key(7), size=100_000))
        se = x.std() / np.sqrt(len(x))
        assert abs(x.mean() - mean) < 5 * se + 1e-3
        if var is not None:
            assert abs(x.var() - var) < 0.05 * max(var, 1.0)

    def test_array_params(self):
        """Array distributions (Markov kernels): (N,) loc gives (N,) draws."""
        loc = jnp.arange(10.0)
        d = dists.Normal(loc=loc, scale=0.001)
        x = d.rvs(jax.random.key(0))  # size inferred from params
        assert x.shape == (10,)
        np.testing.assert_allclose(np.asarray(x), np.arange(10.0), atol=0.01)
        lp = d.logpdf(x)
        assert lp.shape == (10,)

    @pytest.mark.parametrize(
        "d,mean",
        [
            (dists.Poisson(rate=3.0), 3.0),
            (dists.Binomial(n=10, p=0.3), 3.0),
            (dists.Geometric(p=0.25), 4.0),
            (dists.NegativeBinomial(n=3, p=0.5), 3.0),
        ],
    )
    def test_discrete_moments(self, d, mean):
        x = np.asarray(d.rvs(jax.random.key(3), size=50_000))
        assert x.dtype == np.int32
        assert abs(x.mean() - mean) < 0.1 * max(mean, 1.0)

    def test_categorical(self):
        p = jnp.array([0.2, 0.5, 0.3])
        d = dists.Categorical(p=p)
        x = np.asarray(d.rvs(jax.random.key(0), size=20_000))
        freqs = np.bincount(x, minlength=3) / len(x)
        np.testing.assert_allclose(freqs, np.asarray(p), atol=0.02)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.array([0, 1, 2]))), np.log(np.asarray(p)), rtol=1e-5
        )
        # per-particle probabilities
        pN = jnp.stack([p, jnp.array([1.0, 0.0, 0.0])])
        dN = dists.Categorical(p=pN)
        xN = dN.rvs(jax.random.key(1))
        assert xN.shape == (2,)
        assert int(xN[1]) == 0


class TestDiscreteLogpmf:
    def test_poisson(self):
        k = np.arange(8)
        np.testing.assert_allclose(
            np.asarray(dists.Poisson(rate=2.5).logpdf(jnp.asarray(k, jnp.float32))),
            st.poisson(2.5).logpmf(k),
            atol=1e-4,
        )

    def test_binomial(self):
        k = np.arange(6)
        np.testing.assert_allclose(
            np.asarray(dists.Binomial(n=5, p=0.4).logpdf(jnp.asarray(k, jnp.float32))),
            st.binom(5, 0.4).logpmf(k),
            atol=1e-4,
        )

    def test_geometric(self):
        k = np.arange(1, 8)
        np.testing.assert_allclose(
            np.asarray(dists.Geometric(p=0.3).logpdf(jnp.asarray(k, jnp.float32))),
            st.geom(0.3).logpmf(k),
            atol=1e-4,
        )

    def test_negbin(self):
        k = np.arange(8)
        np.testing.assert_allclose(
            np.asarray(
                dists.NegativeBinomial(n=3, p=0.6).logpdf(jnp.asarray(k, jnp.float32))
            ),
            st.nbinom(3, 0.6).logpmf(k),
            atol=1e-4,
        )


class TestTransformsAndMixtures:
    def test_lineard(self):
        d = dists.LinearD(dists.Normal(), a=2.0, b=1.0)
        check_logpdf(d, st.norm(1.0, 2.0), XS)
        check_ppf(d, st.norm(1.0, 2.0))

    def test_logd(self):
        d = dists.LogD(dists.Gamma(a=2.0, b=1.0))
        # Y = log(X), X ~ Gamma(2,1)
        x = np.array([-0.5, 0.0, 0.5], dtype=np.float32)
        expected = st.gamma(2.0).logpdf(np.exp(x)) + x
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.asarray(x))), expected, atol=1e-4
        )

    def test_logitd(self):
        d = dists.LogitD(dists.Beta(a=2.0, b=2.0), a=0.0, b=1.0)
        x = np.asarray(d.rvs(jax.random.key(0), size=10_000))
        assert np.isfinite(x).all()
        lp = np.asarray(d.logpdf(jnp.asarray(x[:5])))
        assert np.isfinite(lp).all()

    def test_mixture(self):
        d = dists.Mixture([0.6, 0.4], dists.Normal(loc=-3.0), dists.Normal(loc=3.0))
        x = np.array([-3.0, 0.0, 3.0], dtype=np.float32)
        expected = np.log(
            0.6 * st.norm(-3.0).pdf(x) + 0.4 * st.norm(3.0).pdf(x)
        )
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.asarray(x))), expected, atol=1e-4
        )
        draws = np.asarray(d.rvs(jax.random.key(0), size=20_000))
        assert abs(draws.mean() - (0.6 * -3 + 0.4 * 3)) < 0.1

    def test_mixmissing(self):
        d = dists.MixMissing(pmiss=0.3, base_dist=dists.Normal())
        x = np.asarray(d.rvs(jax.random.key(0), size=10_000))
        frac = np.isnan(x).mean()
        assert abs(frac - 0.3) < 0.03
        lp = np.asarray(d.logpdf(jnp.array([np.nan, 0.0])))
        np.testing.assert_allclose(lp[0], np.log(0.3), rtol=1e-5)
        np.testing.assert_allclose(
            lp[1], st.norm().logpdf(0.0) + np.log(0.7), rtol=1e-4
        )


class TestMultivariate:
    def test_mvnormal_logpdf(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        loc = np.array([1.0, -1.0])
        d = dists.MvNormal(loc=jnp.asarray(loc), cov=jnp.asarray(cov))
        x = np.random.default_rng(0).normal(size=(6, 2)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.asarray(x))),
            st.multivariate_normal(loc, cov).logpdf(x),
            atol=1e-4,
        )

    def test_mvnormal_rvs_and_ppf(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        d = dists.MvNormal(loc=jnp.zeros(2), cov=jnp.asarray(cov))
        x = np.asarray(d.rvs(jax.random.key(0), size=50_000))
        np.testing.assert_allclose(np.cov(x.T), cov, atol=0.05)
        u = jnp.full((3, 2), 0.5)
        np.testing.assert_allclose(np.asarray(d.ppf(u)), np.zeros((3, 2)), atol=1e-5)
        # partial (degenerate) ppf
        u1 = jnp.full((3, 1), 0.5)
        assert d.ppf(u1).shape == (3, 2)

    def test_mvnormal_posterior(self):
        d = dists.MvNormal(loc=jnp.zeros(2), cov=jnp.eye(2))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(loc=[2.0, -1.0], size=(200, 2)), jnp.float32)
        post = d.posterior(x)
        np.testing.assert_allclose(
            np.asarray(post.loc), [2.0, -1.0], atol=0.25
        )
        np.testing.assert_allclose(np.asarray(post.cov), np.eye(2) / 201, atol=1e-5)

    def test_varyingcov(self):
        covs = jnp.stack([jnp.eye(2), 4.0 * jnp.eye(2)])
        d = dists.VaryingCovNormal(loc=jnp.zeros(2), cov=covs)
        x = jnp.zeros((2, 2))
        lp = np.asarray(d.logpdf(x))
        np.testing.assert_allclose(
            lp[0], st.multivariate_normal(np.zeros(2), np.eye(2)).logpdf([0, 0]), atol=1e-4
        )
        np.testing.assert_allclose(
            lp[1], st.multivariate_normal(np.zeros(2), 4 * np.eye(2)).logpdf([0, 0]), atol=1e-4
        )
        assert d.rvs(jax.random.key(0)).shape == (2, 2)

    def test_dirichlet(self):
        alphas = jnp.array([2.0, 3.0, 5.0])
        d = dists.Dirichlet(alphas=alphas)
        x = np.asarray(d.rvs(jax.random.key(0), size=20_000))
        np.testing.assert_allclose(x.mean(axis=0), [0.2, 0.3, 0.5], atol=0.01)
        xp = np.array([[0.2, 0.3, 0.5]], dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.asarray(xp))),
            st.dirichlet(np.array([2.0, 3.0, 5.0])).logpdf(xp[0]),
            atol=1e-4,
        )

    def test_indepprod_and_iid(self):
        d = dists.IndepProd(dists.Normal(scale=2.0), dists.Gamma(a=2.0, b=3.0))
        assert d.dim == 2
        x = d.rvs(jax.random.key(0), size=9)
        assert x.shape == (9, 2)
        lp = d.logpdf(x)
        expected = st.norm(0, 2).logpdf(np.asarray(x[:, 0])) + st.gamma(
            2.0, scale=1 / 3.0
        ).logpdf(np.asarray(x[:, 1]))
        np.testing.assert_allclose(np.asarray(lp), expected, atol=1e-4)
        iid = dists.IID(dists.Normal(), 3)
        assert iid.rvs(jax.random.key(1), size=5).shape == (5, 3)


class TestStructDist:
    def test_independent_fields(self):
        prior = dists.StructDist({"mu": dists.Normal(), "sigma": dists.Gamma(a=1.0, b=1.0)})
        theta = prior.rvs(jax.random.key(0), size=30)
        assert set(theta.keys()) == {"mu", "sigma"}
        assert theta["mu"].shape == (30,)
        lp = prior.logpdf(theta)
        expected = st.norm().logpdf(np.asarray(theta["mu"])) + st.gamma(1.0).logpdf(
            np.asarray(theta["sigma"])
        )
        np.testing.assert_allclose(np.asarray(lp), expected, atol=1e-4)

    def test_chain_rule(self):
        from collections import OrderedDict

        chain = OrderedDict()
        chain["mu"] = dists.Normal()
        chain["tau"] = dists.Cond(lambda th: dists.Normal(loc=th["mu"], scale=0.001))
        prior = dists.StructDist(chain)
        theta = prior.rvs(jax.random.key(0), size=50)
        np.testing.assert_allclose(
            np.asarray(theta["tau"]), np.asarray(theta["mu"]), atol=0.01
        )
        lp = prior.logpdf(theta)
        assert lp.shape == (50,)

    def test_pytree(self):
        """Distributions are pytrees: jit over parameter values, no retrace."""
        traces = []

        @jax.jit
        def f(d, x):
            traces.append(1)
            return d.logpdf(x)

        x = jnp.array([0.5])
        f(dists.Normal(loc=0.0, scale=1.0), x)
        f(dists.Normal(loc=5.0, scale=2.0), x)
        assert len(traces) == 1


class TestEdgeCaseRegressions:
    """Round-3 self-review regressions."""

    def test_beta_f32_boundary_draws_have_finite_logpdf(self):
        # f32 beta draws hit exactly 0/1 at realistic N; with a,b < 1 the
        # raw logpdf diverges (+inf) and one such particle NaNs a whole run
        d = dists.Beta(a=0.3, b=0.3)
        x = d.rvs(jax.random.key(0), size=200_000)
        lp = np.asarray(d.logpdf(x))
        assert np.isfinite(lp).all()

    def test_beta_logpdf_outside_support_is_neg_inf(self):
        d = dists.Beta(a=2.0, b=3.0)
        assert float(d.logpdf(jnp.float32(-0.5))) == -np.inf
        assert float(d.logpdf(jnp.float32(1.5))) == -np.inf
        # inside the support it still matches scipy
        x = np.linspace(0.05, 0.95, 7).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(jnp.asarray(x))),
            st.beta.logpdf(x, 2.0, 3.0), rtol=1e-4, atol=1e-5)

    def test_binomial_array_n(self):
        n = jnp.arange(1, 11)
        x = np.asarray(dists.Binomial(n=n, p=0.5).rvs(jax.random.key(0)))
        assert x.shape == (10,)
        assert (x >= 0).all() and (x <= np.arange(1, 11)).all()

    def test_negative_binomial_array_n(self):
        n = jnp.arange(1, 11)
        x = np.asarray(
            dists.NegativeBinomial(n=n, p=0.5).rvs(jax.random.key(0)))
        assert x.shape == (10,)
        assert (x >= 0).all()

    def test_geometric_ppf_u_one_is_finite(self):
        d = dists.Geometric(p=0.3)
        k1 = int(d.ppf(jnp.float32(1.0)))
        k2 = int(d.ppf(jnp.float32(1.0) - jnp.finfo(jnp.float32).epsneg))
        assert k1 == k2  # clamped, NOT the int32 overflow sentinel
        assert k1 < 2**30

    def test_mvnormal_scalar_loc_without_cov_raises(self):
        with pytest.raises(ValueError, match="infer the dimension"):
            dists.MvNormal(loc=0.0)
