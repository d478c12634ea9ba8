"""Tests for MCMC / particle MCMC: adaptive RWM, PMMH, CSMC, Particle Gibbs."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

from particles_tpu import distributions as dists
from particles_tpu import kalman
from particles_tpu import mcmc
from particles_tpu import smc_samplers as ssp
from particles_tpu import state_space_models as ssms


class GaussianMean(ssp.StaticModel):
    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(self.data[t])


class TestBasicRWHM:
    def test_conjugate_posterior(self):
        rng = np.random.default_rng(0)
        T = 25
        y = rng.normal(loc=1.0, size=T).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        m = mcmc.BasicRWHM(model=model, niter=5000, key=jax.random.key(1))
        m.run()
        chain = np.asarray(m.chain.theta["mu"])[1000:]
        post_var = 1.0 / (1.0 + T)
        post_mean = post_var * y.sum()
        assert abs(chain.mean() - post_mean) < 0.05
        assert abs(chain.var() - post_var) < 0.02
        assert 0.05 < m.acc_rate < 0.9
        assert float(m.mean_sq_jump_dist()) > 0

    def test_nonadaptive(self):
        rng = np.random.default_rng(1)
        y = rng.normal(loc=1.0, size=10).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        m = mcmc.BasicRWHM(
            model=model, niter=2000, adaptive=False,
            rw_cov=0.3 * np.eye(1), key=jax.random.key(2),
        )
        m.run()
        assert np.isfinite(np.asarray(m.chain.lpost)).all()

    def test_theta0_key_order_independent(self):
        """Regression: theta0 must be packed in the prior-template order,
        not the user's dict insertion order (a mismatch silently swapped
        parameter values)."""

        class TwoParam(ssp.StaticModel):
            def logpyt(self, theta, t):
                return dists.Normal(
                    loc=theta["mu"], scale=theta["sigma"]
                ).logpdf(self.data[t])

        rng = np.random.default_rng(3)
        y = rng.normal(size=8).astype(np.float32)
        prior = dists.StructDist({
            "mu": dists.Normal(loc=0.0, scale=1.0),
            "sigma": dists.Gamma(a=2.0, b=2.0),
        })
        model = TwoParam(data=y, prior=prior)
        m = mcmc.BasicRWHM(model=model, niter=3, adaptive=False,
                           theta0={"sigma": 0.25, "mu": 3.0},
                           key=jax.random.key(0))
        m.run()
        assert abs(float(m.chain.theta["mu"][0]) - 3.0) < 1e-6
        assert abs(float(m.chain.theta["sigma"][0]) - 0.25) < 1e-6
        with pytest.raises(ValueError, match="theta0 keys"):
            mcmc.BasicRWHM(model=model, niter=3, adaptive=False,
                           theta0={"mu": 1.0}, key=jax.random.key(0)).run()


@pytest.fixture(scope="module")
def lg_pmmh_setup():
    true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
    x, y = true.simulate(jax.random.key(0), 25)

    class LGfixed(kalman.LinearGauss):
        default_params = {
            "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
        }

    prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
    # oracle posterior over rho by Kalman grid quadrature
    grid = np.linspace(-0.985, 0.985, 100)
    lls = np.array([
        float(kalman.Kalman(ssm=LGfixed(rho=float(r)), data=y).logLt)
        for r in grid
    ])
    post = np.exp(lls - lls.max())
    post /= post.sum()
    post_mean = float(np.sum(post * grid))
    post_sd = float(np.sqrt(np.sum(post * grid**2) - post_mean**2))
    return LGfixed, prior, y, post_mean, post_sd


class TestPMMH:
    def test_posterior(self, lg_pmmh_setup):
        LGfixed, prior, y, post_mean, post_sd = lg_pmmh_setup
        m = mcmc.PMMH(
            ssm_cls=LGfixed, prior=prior, data=y, Nx=200, niter=2000,
            key=jax.random.key(4),
        )
        m.run()
        chain = np.asarray(m.chain.theta["rho"])[500:]
        # MCMC s.e. roughly post_sd / sqrt(ESS); be generous
        assert abs(chain.mean() - post_mean) < 0.15, (chain.mean(), post_mean)
        assert 0.3 < chain.std() / post_sd < 3.0
        assert m.nacc > 20  # chain moves

    def test_alg_instance_api(self, lg_pmmh_setup):
        LGfixed, prior, y, *_ = lg_pmmh_setup
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=50, niter=10)
        pf = m.alg_instance({"rho": 0.5}, key=jax.random.key(0))
        pf.run()
        assert np.isfinite(float(pf.logLt))


class TestMultiChain:
    """nchains > 1: vmapped chains (TPU extension — the reference runs its
    multi-chain PMMH studies serially, book/pmcmc/pmmh_lingauss.py:15)."""

    def test_rwhm_multichain_posterior(self):
        rng = np.random.default_rng(3)
        T = 25
        y = rng.normal(loc=1.0, size=T).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        nc, niter = 4, 2000
        m = mcmc.BasicRWHM(model=model, niter=niter, nchains=nc,
                           key=jax.random.key(5))
        m.run()
        chain = np.asarray(m.chain.theta["mu"])
        assert chain.shape == (niter, nc)
        assert np.asarray(m.chain.lpost).shape == (niter, nc)
        post_var = 1.0 / (1.0 + T)
        post_mean = post_var * y.sum()
        pooled = chain[500:].ravel()
        assert abs(pooled.mean() - post_mean) < 0.05
        assert abs(pooled.var() - post_var) < 0.02
        # every chain mixes on its own and the acc rate is per-chain
        assert m.acc_rate.shape == (nc,)
        assert (m.acc_rate > 0.05).all() and (m.acc_rate < 0.9).all()
        per_chain_means = chain[500:].mean(axis=0)
        assert np.abs(per_chain_means - post_mean).max() < 0.1
        # chains are genuinely distinct (independent randomness)
        assert np.std(chain[-1]) > 0

    def test_rwhm_multichain_theta0_broadcast_and_perchain(self):
        rng = np.random.default_rng(4)
        y = rng.normal(loc=1.0, size=10).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        # scalar theta0 broadcasts to every chain
        m = mcmc.BasicRWHM(model=model, niter=50, nchains=3,
                           theta0={"mu": 0.3}, key=jax.random.key(6))
        m.run()
        assert np.allclose(np.asarray(m.chain.theta["mu"])[0], 0.3)
        # per-chain theta0 lands per chain
        m2 = mcmc.BasicRWHM(
            model=model, niter=50, nchains=3,
            theta0={"mu": np.array([0.1, 0.2, 0.3], np.float32)},
            key=jax.random.key(7))
        m2.run()
        np.testing.assert_allclose(
            np.asarray(m2.chain.theta["mu"])[0], [0.1, 0.2, 0.3], atol=1e-6)
        with pytest.raises(ValueError):
            mcmc.BasicRWHM(model=model, niter=50, nchains=3,
                           theta0={"mu": np.zeros(2, np.float32)},
                           key=jax.random.key(8)).run()

    def test_multichain_diagnostics(self):
        rng = np.random.default_rng(11)
        y = rng.normal(loc=1.0, size=20).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        m = mcmc.BasicRWHM(model=model, niter=1500, nchains=4,
                           key=jax.random.key(12))
        m.run()
        d = m.diagnostics(discard_frac=0.2)
        # a well-mixing conjugate-target RWHM: converged, nontrivial ESS
        assert d["mu"]["rhat"] < 1.05, d
        assert 50 < d["mu"]["ess"] <= 1500 * 4, d

    def test_pmmh_multichain(self, lg_pmmh_setup):
        LGfixed, prior, y, post_mean, post_sd = lg_pmmh_setup
        nc, niter = 4, 800
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=100,
                      niter=niter, nchains=nc, key=jax.random.key(9))
        m.run()
        chain = np.asarray(m.chain.theta["rho"])
        assert chain.shape == (niter, nc)
        pooled = chain[200:].ravel()
        assert abs(pooled.mean() - post_mean) < 0.15, (pooled.mean(),
                                                       post_mean)
        assert (m.nacc > 10).all()  # every chain moves
        # (P, M) layout feeds the MCMC variance estimators directly
        from particles_tpu import variance_mcmc

        v = float(variance_mcmc.MCMC_variance(
            jnp.asarray(chain[200:]), method="init_seq"))
        assert np.isfinite(v) and v > 0


class TestCSMC:
    def test_pinned_trajectory(self):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = ssm.simulate(jax.random.key(5), 15)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        xstar = jnp.zeros(15)  # arbitrary reference trajectory
        cpf = mcmc.CSMC(fk=fk, N=100, xstar=xstar, key=jax.random.key(6))
        cpf.run()
        # particle 0 is pinned at every time
        np.testing.assert_allclose(
            np.asarray(cpf.hist.X[:, 0]), np.asarray(xstar), atol=1e-6
        )
        # ancestor of particle 0 is 0 at every time
        assert np.all(np.asarray(cpf.hist.A[:, 0]) == 0)
        assert np.isfinite(float(cpf.logLt))

    def test_csmc_mixes(self):
        """Trajectories extracted from CSMC move away from a bad xstar."""
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = ssm.simulate(jax.random.key(7), 15)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        xstar = jnp.full(15, 5.0)  # far from the data
        cpf = mcmc.CSMC(fk=fk, N=500, xstar=xstar, key=jax.random.key(8))
        cpf.run()
        traj = cpf.hist.extract_one_trajectory(jax.random.key(9))
        # extracted trajectory should track the data, not xstar
        assert float(jnp.mean(jnp.abs(traj - y))) < 2.0


class TestParticleGibbs:
    def _build(self, regenerate_data=False, niter=60, backward_step=False):
        class PG(mcmc.ParticleGibbs):
            def update_theta(self, key, theta, x):
                # conjugate update of rho given states (known sigmaX=1):
                # rho | x ~ N(sum(x_t x_{t-1}) / sum(x_{t-1}^2), 1/sum(...))
                xp, xc = x[:-1], x[1:]
                prec = jnp.sum(xp**2) + 1.0  # + prior precision N(0,1)
                mean = jnp.sum(xp * xc) / prec
                draw = mean + jax.random.normal(key, ()) / jnp.sqrt(prec)
                return {"rho": jnp.clip(draw, -0.99, 0.99)}

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        x, y = true.simulate(jax.random.key(1), 30)
        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        return PG(
            ssm_cls=LGfixed, prior=prior, data=y, Nx=100, niter=niter,
            regenerate_data=regenerate_data, backward_step=backward_step,
            store_x=True, key=jax.random.key(2),
        )

    def test_posterior_concentration(self):
        pg = self._build(niter=80)
        pg.run()
        chain = np.asarray(pg.chain.theta["rho"])[20:]
        assert abs(chain.mean() - 0.8) < 0.25
        assert pg.chain.x.shape == (80, 30)

    def test_backward_step(self):
        pg = self._build(niter=20, backward_step=True)
        pg.run()
        assert np.isfinite(np.asarray(pg.chain.theta["rho"])).all()


class TestGibbsSweepFreshTheta:
    """Regression: the state update must condition on the theta sampled
    THIS iteration — a stale theta breaks invariance of the
    systematic-scan Gibbs kernel."""

    def test_update_states_receives_new_theta(self):
        seen = []

        class G(mcmc.GenericGibbs):
            def update_theta(self, key, theta, x):
                return {"mu": theta["mu"] + 1.0}

            def update_states(self, key, theta, x):
                seen.append(float(theta["mu"]))
                return jnp.zeros(3)

        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        g = G(prior=prior, data=np.zeros(3, np.float32), niter=4,
              theta0={"mu": jnp.float32(0.0)}, key=jax.random.key(0))
        g.run()
        # theta_n = n along the +1 chain; update_states at n must see it
        assert seen == [0.0, 1.0, 2.0, 3.0]


class TestPMMHSmcOptions:
    """Regression (round 3): PMMH must honor smc_options/smc_cls (the
    reference forwards them to the inner filter, mcmc.py:424-426) instead
    of silently running a different algorithm."""

    def test_qmc_inner_filter_runs(self, lg_pmmh_setup):
        LGfixed, prior, y, post_mean, _ = lg_pmmh_setup
        m = mcmc.PMMH(
            ssm_cls=LGfixed, prior=prior, data=y, Nx=64, niter=200,
            smc_options={"qmc": True}, key=jax.random.key(2),
        )
        assert m.qmc
        m.run()
        chain = np.asarray(m.chain.theta["rho"])
        assert np.isfinite(chain).all()
        assert m.nacc > 0  # the chain moves

    def test_smc_cls_sqmc(self, lg_pmmh_setup):
        import particles_tpu as particles

        LGfixed, prior, y, *_ = lg_pmmh_setup
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=32,
                      niter=5, smc_cls=particles.SQMC,
                      key=jax.random.key(3))
        assert m.qmc
        m.run()
        assert np.isfinite(np.asarray(m.chain.lpost)).all()

    def test_alg_instance_matches_options(self, lg_pmmh_setup):
        LGfixed, prior, y, *_ = lg_pmmh_setup
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=32,
                      niter=5, smc_options={"qmc": True,
                                            "ESSrmin": 0.7})
        pf = m.alg_instance({"rho": 0.5}, key=jax.random.key(0))
        assert pf.qmc and pf.ESSrmin == 0.7

    def test_unsupported_option_raises(self, lg_pmmh_setup):
        LGfixed, prior, y, *_ = lg_pmmh_setup
        with pytest.raises(ValueError, match="smc_options"):
            mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=32,
                      niter=5, smc_options={"store_history": True})

    def test_unsupported_smc_cls_raises(self, lg_pmmh_setup):
        LGfixed, prior, y, *_ = lg_pmmh_setup
        with pytest.raises(ValueError, match="smc_cls"):
            mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=32,
                      niter=5, smc_cls=dict)
