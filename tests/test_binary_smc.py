"""Binary-space SMC tests: variable selection vs complete enumeration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import binary_smc as bin_smc
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp


@pytest.fixture(scope="module")
def vs_setup():
    rng = np.random.default_rng(0)
    n, p = 40, 6
    X = rng.normal(size=(n, p)).astype(np.float32)
    beta_true = np.array([1.5, -1.0, 0.0, 0.0, 0.8, 0.0], dtype=np.float32)
    y = (X @ beta_true + 0.5 * rng.normal(size=n)).astype(np.float32)
    prior = dists.StructDist(
        {"gamma": dists.IID(bin_smc.Bernoulli(p=0.5), p)}
    )
    model = bin_smc.BayesianVS(data=(X, y), prior=prior)
    # exact posterior by enumeration
    gammas, lp = model.complete_enum()
    post = np.exp(np.asarray(lp) - np.asarray(lp).max())
    post /= post.sum()
    incl = np.asarray(gammas.astype(jnp.float32)).T @ post  # (p,)
    return model, incl


class TestHelpers:
    def test_all_binary_words(self):
        w = np.asarray(bin_smc.all_binary_words(3))
        assert w.shape == (8, 3)
        assert len(np.unique(w.astype(int) @ np.array([1, 2, 4]))) == 8

    def test_chol_and_friends_vs_explicit(self, vs_setup):
        model, _ = vs_setup
        rng = np.random.default_rng(1)
        gamma = jnp.asarray(rng.uniform(size=(20, 6)) < 0.5)
        len_gam, ldet, wtw = bin_smc.chol_and_friends(
            gamma, model.xtx, model.xty, 0.5
        )
        xtx = np.asarray(model.xtx, np.float64)
        xty = np.asarray(model.xty, np.float64)
        for i in range(20):
            g = np.asarray(gamma[i])
            assert float(len_gam[i]) == g.sum()
            if g.sum() == 0:
                assert abs(float(ldet[i])) < 1e-5
                assert abs(float(wtw[i])) < 1e-5
                continue
            sub = xtx[np.ix_(g, g)] + 0.5 * np.eye(g.sum())
            C = np.linalg.cholesky(sub)
            w = np.linalg.solve(C, xty[g])
            np.testing.assert_allclose(
                float(ldet[i]), np.sum(np.log(np.diag(C))), rtol=1e-3
            )
            np.testing.assert_allclose(float(wtw[i]), w @ w, rtol=1e-3)

    def test_nested_logistic_fit_and_sample(self):
        rng = np.random.default_rng(2)
        N, d = 2000, 4
        # correlated binary data
        z = rng.normal(size=(N, 1))
        x = jnp.asarray((rng.normal(size=(N, d)) + z) > 0)
        W = jnp.full((N,), 1.0 / N)
        prop = bin_smc.NestedLogistic.fit(W, x)
        draws = prop.rvs(jax.random.key(0), size=5000)
        # marginal frequencies approximately match
        np.testing.assert_allclose(
            np.asarray(draws.mean(axis=0)),
            np.asarray(x.mean(axis=0)),
            atol=0.06,
        )
        lp = prop.logpdf(draws[:100])
        assert np.isfinite(np.asarray(lp)).all()


class TestVariableSelection:
    def test_tempering_recovers_exact_posterior(self, vs_setup):
        model, exact_incl = vs_setup
        move = ssp.MCMCSequenceWF(mcmc=bin_smc.BinaryMetropolis(), len_chain=4)
        incls = []
        for s in range(3):
            fk = ssp.AdaptiveTempering(
                model=model, len_chain=4, move=move, ESSrmin=0.5
            )
            pf = particles.SMC(fk=fk, N=300, key=jax.random.key(s))
            pf.run()
            W = np.asarray(pf.wgts.W)
            g = np.asarray(pf.X.theta["gamma"], dtype=np.float64)
            incls.append(g.T @ W)
        est = np.mean(incls, axis=0)
        np.testing.assert_allclose(est, exact_incl, atol=0.1)

    def test_bic_and_gprior_run(self, vs_setup):
        model, _ = vs_setup
        X, y = np.asarray(model.x), np.asarray(model.y)
        prior = model.prior
        for cls in (bin_smc.BIC, bin_smc.BayesianVS_gprior):
            m = cls(data=(X, y), prior=prior)
            gammas, lp = m.complete_enum()
            assert np.isfinite(np.asarray(lp)).all()
            # strong true signals should be favored
            best = np.asarray(gammas[int(jnp.argmax(lp))])
            assert best[0] and best[1]
