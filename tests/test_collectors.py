"""Tests for on-line smoothing collectors and variance estimators."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import collectors
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms
from particles_tpu import variance_estimators as var_est
from particles_tpu import variance_mcmc


class LGsmooth(kalman.LinearGauss):
    """LinearGauss with the additive function phi_t(x_{t-1}, x_t) = x_t."""

    def add_func(self, t, xp, x):
        return x


@pytest.fixture(scope="module")
def online_setup():
    ssm = LGsmooth(rho=0.9, sigmaX=1.0, sigmaY=0.3)
    x, y = ssm.simulate(jax.random.key(11), 15)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.smoother()
    return ssm, y, kf


def run_with(ssm, y, col, N=4000, seed=0):
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    pf = particles.SMC(fk=fk, N=N, key=jax.random.key(seed), collect=[col])
    pf.run()
    return pf


class TestOnlineSmoothers:
    def test_naive(self, online_setup):
        ssm, y, kf = online_setup
        pf = run_with(ssm, y, collectors.Online_smooth_naive())
        est = float(pf.summaries.online_smooth_naives[-1])
        exact = float(jnp.sum(kf.smth.mean))
        assert abs(est - exact) < 0.6, (est, exact)

    def test_ON2(self, online_setup):
        ssm, y, kf = online_setup
        pf = run_with(ssm, y, collectors.Online_smooth_ON2(), N=700)
        est = float(pf.summaries.online_smooth_ON2s[-1])
        exact = float(jnp.sum(kf.smth.mean))
        assert abs(est - exact) < 0.6, (est, exact)

    def test_paris(self, online_setup):
        ssm, y, kf = online_setup
        pf = run_with(ssm, y, collectors.Paris(Nparis=2, max_trials=15), N=700)
        est = float(pf.summaries.paris[-1])
        exact = float(jnp.sum(kf.smth.mean))
        assert abs(est - exact) < 0.8, (est, exact)

    def test_methods_agree(self, online_setup):
        """All three on-line smoothers target the same quantity at each t."""
        ssm, y, _ = online_setup
        pf1 = run_with(ssm, y, collectors.Online_smooth_naive(), N=1500, seed=5)
        pf2 = run_with(ssm, y, collectors.Online_smooth_ON2(), N=1500, seed=6)
        a = np.asarray(pf1.summaries.online_smooth_naives)
        b = np.asarray(pf2.summaries.online_smooth_ON2s)
        np.testing.assert_allclose(a, b, atol=0.8)


class TestFixedLag:
    def test_tracks_smoothed_state(self, online_setup):
        ssm, y, kf = online_setup
        pf = run_with(ssm, y, collectors.Fixed_lag_smooth(lag=6), N=4000)
        ests = np.asarray(pf.summaries.fixed_lag_smooths)
        # at time t, the estimate targets E[x_{max(t-6,0)} | y_{0:t}];
        # compare to the full smoother at the final few times (loose check)
        exact = np.asarray(kf.smth.mean)[:, 0]
        T = len(exact)
        for t in range(8, T):
            assert abs(ests[t] - exact[t - 6]) < 0.7, t


class TestVarianceEstimators:
    def test_var_estimate_basic(self):
        """Eve variables all distinct -> estimator reduces to sum W^2 (x-m)^2."""
        W = jnp.array([0.25, 0.25, 0.25, 0.25])
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        B = jnp.arange(4)
        est = var_est.var_estimate(W, x, B)
        m = 2.5
        expected = float(jnp.sum((W * (x - m)) ** 2))
        np.testing.assert_allclose(float(est), expected, rtol=1e-5)

    def test_collapsed_genealogy_gives_zero(self):
        W = jnp.full(4, 0.25)
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        B = jnp.zeros(4, jnp.int32)
        assert float(var_est.var_estimate(W, x, B)) == 0.0

    def test_var_loglt_tracks_empirical_variance(self, online_setup):
        """Single-run Var_logLt estimate vs empirical var over 40 runs."""
        ssm, y, _ = online_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        N = 300
        ests, logLts = [], []
        for s in range(40):
            pf = particles.SMC(
                fk=fk, N=N, key=jax.random.key(s),
                collect=[var_est.Var_logLt()],
            )
            pf.run()
            ests.append(float(pf.summaries.var_logLt[-1]))
            logLts.append(float(pf.logLt))
        # the Lee-Whiteley genealogy estimate is on the var(logLt) scale
        emp = np.var(logLts)
        single = np.mean(ests)
        assert 0.3 < single / emp < 3.0, (single, emp)

    def test_var_collector_shapes(self, online_setup):
        ssm, y, _ = online_setup
        pf = run_with(ssm, y, var_est.Var(), N=500)
        v = np.asarray(pf.summaries.var)
        assert v.shape == (15,)
        assert np.all(v >= 0)

    def test_lag_based_var(self, online_setup):
        ssm, y, _ = online_setup
        pf = run_with(ssm, y, var_est.Lag_based_var(lag=4), N=500)
        v = np.asarray(pf.summaries.lag_based_var)
        assert v.shape == (15, 5)
        assert np.all(v >= 0)


class TestMCMCVariance:
    def test_iid_chains(self):
        """For IID standard normals, sigma^2 should be ~1 for all methods."""
        rng = np.random.default_rng(0)
        X = rng.normal(size=(2000, 8))
        for method in ("naive", "init_seq", "th"):
            v = variance_mcmc.MCMC_variance(X, method)
            assert 0.7 < v < 1.4, (method, v)

    def test_ar1_chains(self):
        """AR(1) with rho=0.8: sigma^2 = (1+rho)/(1-rho) = 9."""
        rng = np.random.default_rng(1)
        rho = 0.8
        P, M = 20000, 4
        X = np.zeros((P, M))
        noise = rng.normal(size=(P, M)) * np.sqrt(1 - rho**2)
        for t in range(1, P):
            X[t] = rho * X[t - 1] + noise[t]
        for method in ("init_seq", "th"):
            v = variance_mcmc.MCMC_variance(X, method)
            assert 6.0 < v < 12.5, (method, v)

    def test_weighted(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(1000, 8))
        W = np.full(8, 1 / 8)
        v = variance_mcmc.MCMC_variance_weighted(X, W, "init_seq")
        assert 0.6 < v < 1.5


class TestChainDiagnostics:
    """Multi-chain convergence diagnostics (split-Rhat / ESS) — companion
    to mcmc's nchains support; no counterpart in the reference."""

    @staticmethod
    def _ar1(rng, rho, P, M):
        X = np.zeros((P, M))
        noise = rng.normal(size=(P, M)) * np.sqrt(1 - rho**2)
        for t in range(1, P):
            X[t] = rho * X[t - 1] + noise[t]
        return X

    def test_iid_chains(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(4000, 4))
        assert variance_mcmc.gelman_rubin(X) < 1.01
        e = variance_mcmc.ess(X)
        assert 0.8 * X.size < e < 1.3 * X.size

    def test_ar1_iact(self):
        """AR(1) rho=0.9: IACT = (1+rho)/(1-rho) = 19, ess ~ P*M/19."""
        rng = np.random.default_rng(1)
        P, M = 20000, 4
        X = self._ar1(rng, 0.9, P, M)
        assert variance_mcmc.gelman_rubin(X) < 1.02
        e = variance_mcmc.ess(X)
        assert P * M / 30 < e < P * M / 12, e

    def test_rhat_detects_disagreeing_chains(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(2000, 4))
        X[:, 0] += 3.0  # one chain stuck in a different mode
        assert variance_mcmc.gelman_rubin(X) > 1.5

    def test_rhat_detects_trend_single_chain(self):
        """Split-Rhat alarms on within-chain drift even with M=1."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=3000) + np.linspace(0.0, 4.0, 3000)
        assert variance_mcmc.gelman_rubin(x) > 1.5
        assert variance_mcmc.gelman_rubin(rng.normal(size=3000)) < 1.01

    def test_chain_diagnostics_dict(self):
        rng = np.random.default_rng(4)
        P, M = 2000, 4
        good = rng.normal(size=(P, M))
        multi = rng.normal(size=(P, M, 2))
        multi[:, :, 1] += np.where(np.arange(M) == 0, 3.0, 0.0)  # bad comp
        d = variance_mcmc.chain_diagnostics(
            {"a": good, "b": multi}, nchains=M)
        assert d["a"]["rhat"] < 1.01
        assert d["b"]["rhat"] > 1.5  # worst component reported
        assert 0 < d["a"]["ess"] <= 1.35 * P * M
        # single-chain layouts: (P,) and (P, d)
        d1 = variance_mcmc.chain_diagnostics(
            {"a": rng.normal(size=P), "b": rng.normal(size=(P, 3))})
        assert d1["a"]["rhat"] < 1.01 and d1["b"]["rhat"] < 1.02
        # discard drops burn-in: a transient start alarms, post-burn is fine
        warm = rng.normal(size=(P, M))
        warm[:600] += 5.0
        dall = variance_mcmc.chain_diagnostics({"a": warm}, nchains=M)
        dcut = variance_mcmc.chain_diagnostics({"a": warm}, nchains=M,
                                               discard=600)
        assert dall["a"]["rhat"] > 1.1 and dcut["a"]["rhat"] < 1.01
        with pytest.raises(ValueError):
            variance_mcmc.chain_diagnostics({"a": good}, nchains=3)


class TestHostSideCollectorsOnFilters:
    """Var_phi/Var_logLt run host-side NumPy: attaching them to a plain
    (scan-engine) filter must transparently fall back to step-by-step
    execution instead of dying with a TracerArrayConversionError."""

    def test_var_phi_on_filter(self):
        import particles_tpu as particles
        from particles_tpu import kalman
        from particles_tpu import smc_samplers as ssp
        from particles_tpu import state_space_models as ssms

        lg = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = lg.simulate(jax.random.key(0), 12)
        pf = particles.SMC(
            fk=ssms.Bootstrap(ssm=lg, data=y), N=64,
            collect=[ssp.Var_phi(phi=lambda xx: np.asarray(xx)),
                     ssp.Var_logLt()],
            key=jax.random.key(1))
        assert not pf._static_horizon  # host-side collectors: step mode
        pf.run()
        for name in ("var_phi", "var_logLt"):
            v = np.asarray(getattr(pf.summaries, name))
            assert v.shape == (12,) and np.isfinite(v).all(), name
        # defaults still collected alongside
        assert np.asarray(pf.summaries.ESSs).shape == (12,)
