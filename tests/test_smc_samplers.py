"""SMC-sampler tests, in the reference's house style (SURVEY.md §4c):
exactness-by-conjugacy for IBIS/tempering, grid-quadrature oracle for SMC²."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import kalman
from particles_tpu import smc_samplers as ssp


class GaussianMean(ssp.StaticModel):
    """y_t ~ N(mu, 1), mu ~ N(0, 1): fully conjugate."""

    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(self.data[t])


@pytest.fixture(scope="module")
def conj_setup():
    rng = np.random.default_rng(0)
    T = 30
    y = rng.normal(loc=1.5, size=T).astype(np.float32)
    prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
    model = GaussianMean(data=y, prior=prior)
    cov = np.eye(T) + np.ones((T, T))
    exact_ev = st.multivariate_normal(np.zeros(T), cov).logpdf(y)
    post_var = 1.0 / (1.0 + T)
    post_mean = post_var * y.sum()
    return model, y, exact_ev, post_mean, post_var


def posterior_stats(pf):
    mu = np.asarray(pf.X.theta["mu"])
    W = np.asarray(pf.wgts.W)
    m = np.sum(W * mu)
    v = np.sum(W * mu**2) - m**2
    return m, v


class TestIBIS:
    def test_evidence_and_posterior(self, conj_setup):
        model, y, exact_ev, post_mean, post_var = conj_setup
        logLts, means = [], []
        for s in range(8):
            pf = particles.SMC(
                fk=ssp.IBIS(model=model, len_chain=5), N=200,
                key=jax.random.key(s),
            )
            pf.run()
            logLts.append(float(pf.logLt))
            means.append(posterior_stats(pf)[0])
        assert abs(np.mean(logLts) - exact_ev) < 0.15, (np.mean(logLts), exact_ev)
        assert abs(np.mean(means) - post_mean) < 0.05

    def test_standard_not_wastefree(self, conj_setup):
        model, y, exact_ev, post_mean, post_var = conj_setup
        pf = particles.SMC(
            fk=ssp.IBIS(model=model, wastefree=False, len_chain=6),
            N=1000, key=jax.random.key(5),
        )
        pf.run()
        assert abs(float(pf.logLt) - exact_ev) < 0.6
        m, v = posterior_stats(pf)
        assert abs(m - post_mean) < 0.1
        assert pf.X.N == 1000  # no waste-free expansion

    def test_wastefree_particle_count(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(
            fk=ssp.IBIS(model=model, len_chain=5), N=100,
            key=jax.random.key(0),
        )
        pf.run()
        assert pf.X.N == 500  # N * len_chain


class TestTempering:
    def test_adaptive(self, conj_setup):
        model, y, exact_ev, post_mean, post_var = conj_setup
        logLts, pss, means, vars_ = [], [], [], []
        for s in range(8):
            pf = particles.SMC(
                fk=ssp.AdaptiveTempering(model=model, len_chain=5),
                N=200, key=jax.random.key(s),
            )
            pf.run()
            assert float(pf.X.shared["exponent"]) == 1.0
            logLts.append(float(pf.logLt))
            pss.append(float(pf.X.shared["path_sampling"]))
            m, v = posterior_stats(pf)
            means.append(m)
            vars_.append(v)
        assert abs(np.mean(logLts) - exact_ev) < 0.15
        # path-sampling estimate agrees with the SMC estimate
        assert abs(np.mean(pss) - exact_ev) < 0.3
        assert abs(np.mean(means) - post_mean) < 0.05
        assert abs(np.mean(vars_) - post_var) < 0.02

    def test_fixed_exponents(self, conj_setup):
        model, y, exact_ev, *_ = conj_setup
        fk = ssp.Tempering(
            model=model, exponents=np.linspace(0.1, 1.0, 10), len_chain=5
        )
        pf = particles.SMC(fk=fk, N=300, key=jax.random.key(1))
        pf.run()
        assert pf.t == 10
        assert abs(float(pf.logLt) - exact_ev) < 0.5

    def test_independent_metropolis_move(self, conj_setup):
        model, y, exact_ev, *_ = conj_setup
        move = ssp.MCMCSequenceWF(
            mcmc=ssp.ArrayIndependentMetropolis(), len_chain=5
        )
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(model=model, len_chain=5, move=move),
            N=300, key=jax.random.key(2),
        )
        pf.run()
        assert abs(float(pf.logLt) - exact_ev) < 0.5

    def test_adaptive_mcmc_sequence(self, conj_setup):
        model, *_ = conj_setup
        move = ssp.AdaptiveMCMCSequence(len_chain=12, adaptive=True)
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(
                model=model, wastefree=False, len_chain=12, move=move
            ),
            N=500, key=jax.random.key(3),
        )
        pf.run()
        assert float(pf.X.shared["exponent"]) == 1.0


class TestTemperingBridge:
    def test_gaussian_target(self):
        """Bridge from N(0, 3^2) base to N(2, 0.5^2) target."""

        class Bridge(ssp.TemperingBridge):
            def logtarget(self, theta):
                return dists.Normal(loc=2.0, scale=0.5).logpdf(theta["x"])

        base = dists.StructDist({"x": dists.Normal(loc=0.0, scale=3.0)})
        model = Bridge(base_dist=base)
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(model=model, len_chain=6), N=300,
            key=jax.random.key(4),
        )
        pf.run()
        xs = np.asarray(pf.X.theta["x"])
        W = np.asarray(pf.wgts.W)
        assert abs(np.sum(W * xs) - 2.0) < 0.1
        # logLt estimates log of target normalising constant = 0
        assert abs(float(pf.logLt)) < 0.2


class TestCollectorsAndVariance:
    def test_moments_collector(self, conj_setup):
        from particles_tpu import collectors

        model, y, _, post_mean, _ = conj_setup
        pf = particles.SMC(
            fk=ssp.IBIS(model=model, len_chain=5), N=200,
            key=jax.random.key(0), collect=[collectors.Moments()],
        )
        pf.run()
        moms = pf.summaries.moments
        assert len(moms) == 30
        assert abs(float(moms[-1]["mean"]["mu"]) - post_mean) < 0.1

    def test_var_wf(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(model=model, len_chain=10), N=100,
            key=jax.random.key(1),
        )
        pf.run()
        v = ssp.var_wf(pf, lambda x: np.asarray(x.theta["mu"]))
        assert v > 0
        # sanity: var of posterior-mean estimate should be < prior var
        assert v / pf.wgts.W.shape[0] < 1.0

    def test_var_collectors(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(model=model, len_chain=10), N=100,
            key=jax.random.key(2),
            collect=[
                ssp.Var_phi(phi=lambda x: np.asarray(x.theta["mu"])),
                ssp.Var_logLt(),
            ],
        )
        pf.run()
        assert len(pf.summaries.var_phi) == pf.t
        assert len(pf.summaries.var_logLt) == pf.t
        assert all(float(v) >= 0 for v in pf.summaries.var_phi)


class TestImportanceSampler:
    def test_conjugate(self, conj_setup):
        model, y, exact_ev, post_mean, _ = conj_setup
        sampler = ssp.ImportanceSampler(model=model)
        sampler.run(N=100_000, key=jax.random.key(0))
        assert abs(float(sampler.log_norm_cst) - exact_ev) < 0.2


class TestSMC2:
    @pytest.fixture(scope="class")
    def smc2_setup(self):
        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        x, y = true.simulate(jax.random.key(0), 12)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        # oracle: marginal evidence by grid quadrature over rho
        grid = np.linspace(-0.985, 0.985, 80)
        lls = []
        for r in grid:
            kf = kalman.Kalman(ssm=LGfixed(rho=float(r)), data=y)
            kf.filter()
            lls.append(float(kf.logLt))
        lls = np.array(lls)
        prior_dens = 1.0 / (2 * 0.99)
        from scipy.special import logsumexp

        exact_ev = logsumexp(lls) + np.log(prior_dens * (grid[1] - grid[0]))
        post = np.exp(lls - lls.max())
        post /= post.sum()
        exact_pmean = np.sum(post * grid)
        return LGfixed, prior, y, exact_ev, exact_pmean

    def test_evidence_and_posterior(self, smc2_setup):
        LGfixed, prior, y, exact_ev, exact_pmean = smc2_setup
        logLts, means = [], []
        for s in range(4):
            fk = ssp.SMC2(
                ssm_cls=LGfixed, prior=prior, data=y, init_Nx=150,
                len_chain=4,
            )
            pf = particles.SMC(fk=fk, N=150, key=jax.random.key(s))
            pf.run()
            logLts.append(float(pf.logLt))
            W = np.asarray(pf.wgts.W)
            means.append(np.sum(W * np.asarray(pf.X.theta["rho"])))
        assert abs(np.mean(logLts) - exact_ev) < 0.4, (np.mean(logLts), exact_ev)
        assert abs(np.mean(means) - exact_pmean) < 0.25, (np.mean(means), exact_pmean)

    def test_wastefree_smc2(self, smc2_setup):
        """Waste-free SMC² (M starting points, len_chain states kept):
        the inner-filter pytrees ride the waste-free concatenate and the
        M*P -> M subset; evidence stays oracle-consistent."""
        LGfixed, prior, y, exact_ev, _ = smc2_setup
        vals = []
        for s in range(3):
            fk = ssp.SMC2(
                ssm_cls=LGfixed, prior=prior, data=y, init_Nx=100,
                wastefree=True, len_chain=4,
            )
            pf = particles.SMC(fk=fk, N=50, key=jax.random.key(s))
            pf.run()
            assert pf.X.N == 50 * 4  # N0 = M * len_chain
            vals.append(float(pf.logLt))
        assert abs(np.mean(vals) - exact_ev) < 0.6, (vals, exact_ev)


class TestSMC2Exchange:
    def test_exchange_doubles_nx_and_stays_sane(self):
        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        x, y = true.simulate(jax.random.key(0), 10)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        # absurd threshold forces an exchange at every resample-move step
        fk = ssp.SMC2(
            ssm_cls=LGfixed, prior=prior, data=y, init_Nx=20, len_chain=3,
            ar_to_increase_Nx=0.95,
        )
        pf = particles.SMC(fk=fk, N=40, key=jax.random.key(3))
        pf.run()
        assert pf.X.xs.shape[-1] > 20  # Nx was doubled at least once
        assert np.isfinite(float(pf.logLt))
        # weights stay sane after the likelihood-ratio correction
        assert float(pf.wgts.ESS) > 1.0


class TestSMC2InnerLoglik:
    def test_inner_loglik_unbiased(self):
        """Regression test for the y_0 double-count: at a near-Dirac prior,
        the inner filters' accumulated loglik must be unbiased for the exact
        Kalman logLt."""
        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        x, y = true.simulate(jax.random.key(0), 5)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.8, "sigmaX": 1.0, "sigma0": None
            }

        kf = kalman.Kalman(ssm=LGfixed(), data=y)
        kf.filter()
        exact = float(kf.logLt)
        prior = dists.StructDist({"rho": dists.Uniform(a=0.7999, b=0.8001)})
        lls = []
        for s in range(10):
            fk = ssp.SMC2(
                ssm_cls=LGfixed, prior=prior, data=y, init_Nx=2000,
                len_chain=2,
            )
            pf = particles.SMC(fk=fk, N=5, key=jax.random.key(s))
            pf.run()
            lls.append(float(jnp.mean(pf.X.loglik)))
        assert abs(np.mean(lls) - exact) < 0.05, (np.mean(lls), exact)


class TestSMC2ExchangeAccounting:
    """White-box checks of the exchange step's evidence accounting and the
    replay key hygiene (reference smc_samplers.py:1118, 1129-1143)."""

    def _setup(self, ar=0.95):
        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        _, y = true.simulate(jax.random.key(0), 8)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        return LGfixed, prior, y

    def test_exchange_updates_logLt_by_weighted_delta(self):
        LGfixed, prior, y = self._setup()
        known_delta = 0.3

        class FixedDeltaSMC2(ssp.SMC2):
            """Exchange whose replay pretends each new filter's loglik is
            the old one + known_delta (isolates the accounting)."""

            def _replay_all(self, key, x, t, new_Nx):
                xs = jnp.zeros(x.xs.shape[:1] + (new_Nx,) + x.xs.shape[2:])
                lws = jnp.zeros(x.lws.shape[:1] + (new_Nx,))
                return xs, lws, x.loglik + known_delta

        fk = FixedDeltaSMC2(
            ssm_cls=LGfixed, prior=prior, data=y, init_Nx=16, len_chain=3,
            ar_to_increase_Nx=2.0,  # always trigger after a resample-move
        )
        pf = particles.SMC(fk=fk, N=32, key=jax.random.key(5))
        # step until a resample-move step happened
        next(pf)
        while not bool(pf.rs_flag):
            next(pf)
        logLt_before = float(pf._carry.logLt)
        lw_before = np.asarray(pf._carry.lw)
        from particles_tpu import resampling as rs

        W = np.asarray(rs.exp_and_normalise(jnp.asarray(lw_before)))
        expected_corr = np.log(np.sum(W * np.exp(known_delta)))
        fk.maybe_exchange(pf)
        assert pf.X.xs.shape[1] == 32  # Nx doubled
        got_corr = float(pf._carry.logLt) - logLt_before
        assert abs(got_corr - expected_corr) < 1e-4, (got_corr, expected_corr)
        # log_mean_w refreshed to the post-exchange weights
        lme_new = float(jnp.log(jnp.mean(jnp.exp(
            jnp.asarray(lw_before + known_delta)
            - np.max(lw_before + known_delta)
        ))) + np.max(lw_before + known_delta))
        assert abs(float(pf._carry.log_mean_w) - lme_new) < 1e-4
        # constant delta: weights unchanged after normalisation, and the
        # correction reduces to delta itself
        assert abs(got_corr - known_delta) < 1e-4

    def test_move_target_uses_fresh_keys(self):
        """Two target evaluations with different keys must replay with
        different inner randomness (pseudo-marginal hygiene: no fixed seed,
        no reuse across successive moves)."""
        LGfixed, prior, y = self._setup()
        fk = ssp.SMC2(
            ssm_cls=LGfixed, prior=prior, data=y, init_Nx=16, len_chain=3,
        )
        pf = particles.SMC(fk=fk, N=24, key=jax.random.key(2))
        for _ in range(3):
            next(pf)
        x = pf._carry.X
        target = fk.move_target(pf.t, x)
        ll_a = np.asarray(target(x, key=jax.random.key(10)).loglik)
        ll_b = np.asarray(target(x, key=jax.random.key(11)).loglik)
        ll_a2 = np.asarray(target(x, key=jax.random.key(10)).loglik)
        assert not np.allclose(ll_a, ll_b)  # fresh randomness per key
        np.testing.assert_allclose(ll_a, ll_a2)  # deterministic given key


class TestSamplerHistoryOptions:
    """Regression (round 3): store_history=int/callable on an SMC sampler
    must produce a FILLED history (previously returned an empty object)."""

    def test_rolling(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(fk=ssp.IBIS(model=model, len_chain=3), N=50,
                           store_history=2, key=jax.random.key(0))
        pf.run()
        assert pf.hist is not None
        assert pf.hist.T == 2  # rolling window of the 2 last systems
        assert list(pf.hist.times) == [pf.t - 2, pf.t - 1]
        assert np.isfinite(np.asarray(pf.hist.X[-1].theta["mu"])).all()

    def test_callable(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(fk=ssp.IBIS(model=model, len_chain=3), N=50,
                           store_history=lambda t: t % 2 == 0,
                           key=jax.random.key(1))
        pf.run()
        assert list(pf.hist.times) == [t for t in range(pf.t) if t % 2 == 0]
        assert len(pf.hist.X) == len(pf.hist.times)

    def test_full_history_unchanged(self, conj_setup):
        model, *_ = conj_setup
        pf = particles.SMC(fk=ssp.IBIS(model=model, len_chain=3), N=50,
                           store_history=True, key=jax.random.key(2))
        pf.run()
        assert pf.hist.T == pf.t

    def test_rolling_history_checkpoint_roundtrip(self, conj_setup):
        """Regression: SamplerHistory deques are not pytree nodes, so
        save_state must materialise them (previously crashed/pickled an
        unrestorable object array); window semantics survive the resume."""
        import os
        import tempfile

        model, *_ = conj_setup
        pf1 = particles.SMC(fk=ssp.IBIS(model=model, len_chain=3), N=50,
                            store_history=3, key=jax.random.key(4))
        for _ in range(5):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_sampler.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=ssp.IBIS(model=model, len_chain=3), N=50,
                            store_history=3, key=jax.random.key(0))
        pf2.load_state(path)
        assert list(pf2.hist.times) == list(pf1.hist.times)
        np.testing.assert_array_equal(
            np.asarray(pf2.hist.X[-1].theta["mu"]),
            np.asarray(pf1.hist.X[-1].theta["mu"]))
        for _ in pf2:
            pass
        # the restored deque keeps rolling: still a 3-frame window at end
        assert pf2.hist.T == 3
        assert list(pf2.hist.times) == [pf2.t - 3, pf2.t - 2, pf2.t - 1]


class TestSMC2SmcOptions:
    """Regression (round 3): SMC2 smc_options must be honored or raise."""

    def test_supported_options_run(self):
        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        x, y = true.simulate(jax.random.key(0), 8)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        fk = ssp.SMC2(ssm_cls=LGfixed, prior=prior, data=y, init_Nx=50,
                      len_chain=3,
                      smc_options={"resampling": "stratified",
                                   "ESSrmin": 0.6})
        pf = particles.SMC(fk=fk, N=50, key=jax.random.key(1))
        pf.run()
        assert np.isfinite(float(pf.logLt))

    def test_unsupported_option_raises(self):
        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        with pytest.raises(ValueError, match="smc_options"):
            ssp.SMC2(ssm_cls=kalman.LinearGauss, prior=prior,
                     data=np.zeros(4, np.float32), init_Nx=10,
                     smc_options={"qmc": True})


class TestTemperingEdgeCases:
    """Regressions from the round-3 self-review."""

    def test_path_sampling_finite_with_zero_likelihood_particles(self):
        """A particle with llik = -inf must not NaN-poison the trapezoidal
        path-sampling accumulator (0 * -inf)."""
        rng = np.random.default_rng(0)
        y = rng.normal(loc=1.0, size=20).astype(np.float32)

        class Trunc(ssp.StaticModel):
            def logpyt(self, theta, t):
                lp = dists.Normal(loc=theta["mu"], scale=1.0).logpdf(
                    self.data[t])
                return jnp.where(theta["mu"] > 2.5, -jnp.inf, lp)

        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=2.0)})
        model = Trunc(data=y, prior=prior)
        fk = ssp.AdaptiveTempering(model=model, len_chain=4, ESSrmin=0.5)
        pf = particles.SMC(fk=fk, N=64, key=jax.random.key(0))
        pf.run()
        assert np.isfinite(float(pf.X.shared["path_sampling"]))
        assert np.isfinite(float(pf.logLt))

    def test_adaptive_move_reports_realised_acc_rate(self):
        """AdaptiveMCMCSequence(adaptive=True) must install the acceptance
        rate it actually realised (a stale carried 0.0 here made SMC2's
        Nx-doubling trigger fire on every step)."""
        rng = np.random.default_rng(1)
        y = rng.normal(loc=1.0, size=15).astype(np.float32)
        prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
        model = GaussianMean(data=y, prior=prior)
        fk = ssp.IBIS(model=model, wastefree=False, len_chain=5,
                      move=ssp.AdaptiveMCMCSequence(len_chain=5,
                                                    adaptive=True))
        pf = particles.SMC(fk=fk, N=64, key=jax.random.key(1))
        pf.run()
        ar = float(pf.X.shared["acc_rate"])
        assert 0.0 < ar <= 1.0, ar


class TestSubsetByCountsKernelRoute:
    """ADVICE r3: subset_by_counts' fused kernel route (taken on TPU when
    the plan is available) has no direct CPU coverage — exercise it in
    interpret mode: field splitting, (N, d<=2) columns through the f32
    kernel, int32/(N,5) fields through the jnp.repeat fallback."""

    def test_matches_jnp_repeat_per_field(self):
        from jax.experimental import pallas as pl
        import particles_tpu.ops.repeat_kernel as rk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        rk.pl.pallas_call = patched
        orig_on_tpu = rk._on_tpu
        rk._on_tpu = lambda: True
        try:
            N = 2048
            rng = np.random.default_rng(5)
            theta = {
                "mu": jnp.asarray(rng.normal(size=N), jnp.float32),
                "cov2": jnp.asarray(rng.normal(size=(N, 2)), jnp.float32),
                "wide": jnp.asarray(rng.normal(size=(N, 5)), jnp.float32),
            }
            tp = ssp.ThetaParticles(
                theta=theta,
                lpost=jnp.asarray(rng.normal(size=N), jnp.float32),
                hits=jnp.asarray(rng.integers(0, 2**28, size=N),
                                 jnp.int32),
                shared={"tag": 7},
            )
            counts = jnp.asarray(
                rng.multinomial(N, rng.dirichlet(np.ones(N) * 0.3)),
                jnp.int32)
            out = tp.subset_by_counts(counts, N)

            def ref(a):
                return jnp.repeat(a, counts, axis=0, total_repeat_length=N)

            for k in theta:
                assert bool(jnp.all(out.theta[k] == ref(theta[k]))), k
                assert out.theta[k].dtype == theta[k].dtype, k
            assert bool(jnp.all(out.lpost == ref(tp.lpost)))
            # int32 user field: excluded from the f32 kernel round-trip
            # (values >= 2^24 would round) — exact via the fallback
            assert out.hits.dtype == jnp.int32
            assert bool(jnp.all(out.hits == ref(tp.hits)))
            assert out.shared == tp.shared
        finally:
            rk.pl.pallas_call = orig
            rk._on_tpu = orig_on_tpu
            rk._repeat_pallas_n.clear_cache()
