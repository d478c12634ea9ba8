"""Smoothing tests: FFBS variants vs the exact Kalman smoother, genealogy
tracing, two-filter smoothing (SURVEY.md §4 house style)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


@pytest.fixture(scope="module")
def smooth_setup():
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
    x, y = ssm.simulate(jax.random.key(7), 20)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.smoother()
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    pf = particles.SMC(fk=fk, N=3000, key=jax.random.key(1), store_history=True)
    pf.run()
    return ssm, y, kf, pf


def check_paths_vs_kalman(paths, kf, atol):
    means = np.asarray(jnp.mean(paths, axis=1))
    exact = np.asarray(kf.smth.mean)[:, 0]
    np.testing.assert_allclose(means, exact, atol=atol)
    # smoothing variance sanity too
    stds = np.asarray(jnp.std(paths, axis=1))
    exact_std = np.sqrt(np.asarray(kf.smth.cov)[:, 0, 0])
    np.testing.assert_allclose(stds, exact_std, atol=0.12)


class TestHistory:
    def test_compute_trajectories_shape_and_validity(self, smooth_setup):
        *_, pf = smooth_setup
        B = pf.hist.compute_trajectories()
        T, N = pf.hist.T, pf.hist.N
        assert B.shape == (T, N)
        assert np.all(np.asarray(B[-1]) == np.arange(N))
        # B[t] = A[t+1][B[t+1]]
        for t in [0, 5, T - 2]:
            np.testing.assert_array_equal(
                np.asarray(B[t]),
                np.asarray(pf.hist.A[t + 1])[np.asarray(B[t + 1])],
            )

    def test_extract_one_trajectory(self, smooth_setup):
        *_, pf = smooth_setup
        traj = pf.hist.extract_one_trajectory(jax.random.key(0))
        assert traj.shape == (pf.hist.T,)
        assert np.isfinite(np.asarray(traj)).all()


class TestFFBS:
    def test_ON2(self, smooth_setup):
        ssm, y, kf, pf = smooth_setup
        paths = pf.hist.backward_sampling_ON2(jax.random.key(2), 1500)
        assert paths.shape == (20, 1500)
        check_paths_vs_kalman(paths, kf, atol=0.1)

    def test_mcmc(self, smooth_setup):
        ssm, y, kf, pf = smooth_setup
        paths = pf.hist.backward_sampling_mcmc(jax.random.key(3), 1500, nsteps=2)
        check_paths_vs_kalman(paths, kf, atol=0.1)

    def test_reject_hybrid(self, smooth_setup):
        ssm, y, kf, pf = smooth_setup
        paths = pf.hist.backward_sampling_reject(
            jax.random.key(4), 1500, max_trials=20
        )
        check_paths_vs_kalman(paths, kf, atol=0.1)
        acc = np.asarray(pf.hist.acc_rate)
        assert acc.shape == (19,)
        assert np.all(acc > 0) and np.all(acc <= 1.0)

    def test_variants_agree_with_each_other(self, smooth_setup):
        """All FFBS variants target the same smoothing distribution."""
        *_, pf = smooth_setup
        m1 = jnp.mean(pf.hist.backward_sampling_ON2(jax.random.key(5), 800), axis=1)
        m2 = jnp.mean(pf.hist.backward_sampling_mcmc(jax.random.key(6), 800), axis=1)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=0.15)


class TestTwoFilter:
    def test_ON2_matches_kalman(self, smooth_setup):
        ssm, y, kf, pf = smooth_setup
        # information filter: same model on reversed data
        fk_info = ssms.Bootstrap(ssm=ssm, data=y[::-1])
        infopf = particles.SMC(
            fk=fk_info, N=3000, key=jax.random.key(9), store_history=True
        )
        infopf.run()
        loggamma = lambda x: ssm.PX0().logpdf(x)
        for t in [5, 10]:
            est = pf.hist.two_filter_smoothing(
                t, infopf, lambda x, xf: x, loggamma
            )
            exact = float(kf.smth.mean[t, 0])
            assert abs(float(est) - exact) < 0.15, (t, float(est), exact)

    def test_ON_linear_cost(self, smooth_setup):
        ssm, y, kf, pf = smooth_setup
        fk_info = ssms.Bootstrap(ssm=ssm, data=y[::-1])
        infopf = particles.SMC(
            fk=fk_info, N=3000, key=jax.random.key(10), store_history=True
        )
        infopf.run()
        loggamma = lambda x: ssm.PX0().logpdf(x)
        est, ess = pf.hist.two_filter_smoothing(
            8, infopf, lambda x, xf: x, loggamma, linear_cost=True,
            return_ess=True, key=jax.random.key(11),
        )
        exact = float(kf.smth.mean[8, 0])
        assert abs(float(est) - exact) < 0.3
        assert float(ess) > 1.0


class TestSmoothingWorker:
    @pytest.mark.parametrize(
        "method", ["FFBS_ON2", "FFBS_MCMC", "FFBS_hybrid", "two-filter_ON2",
                   "two-filter_ON"]
    )
    def test_worker(self, method, smooth_setup):
        ssm, y, kf, _ = smooth_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        add_func = lambda t, x, xf: x
        log_gamma = lambda x: ssm.PX0().logpdf(x)
        out = particles.smoothing.smoothing_worker(
            method=method, N=500, fk=fk, add_func=add_func,
            log_gamma=log_gamma, key=jax.random.key(12),
        )
        est = np.asarray(out["est"])
        exact = np.asarray(kf.smth.mean)[:-1, 0]
        assert est.shape == exact.shape
        np.testing.assert_allclose(est, exact, atol=0.45)
        assert out["cpu"] > 0
