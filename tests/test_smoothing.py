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


class TestWindowedHistory:
    """Rolling / partial history in the compiled scan path: O(k N) ring in
    the carry, equivalent to step-by-step mode (reference
    smoothing.py:164-219)."""

    def _fk(self, T=30):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
        _, y = ssm.simulate(jax.random.key(0), T)
        return ssms.Bootstrap(ssm=ssm, data=y)

    def test_rolling_scan_matches_stepping(self):
        fk = self._fk()
        pf_scan = particles.SMC(fk=fk, N=800, key=jax.random.key(1),
                                store_history=5)
        assert pf_scan._static_horizon  # compiled path
        pf_scan.run()
        pf_step = particles.SMC(fk=fk, N=800, key=jax.random.key(1),
                                store_history=5)
        for _ in pf_step:
            pass
        hs, hp = pf_scan.hist, pf_step.hist
        assert hs.T == hp.T == 5
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(hs.X[i]), np.asarray(hp.X[i]), atol=1e-5)
            assert np.array_equal(np.asarray(hs.A[i]), np.asarray(hp.A[i]))
            np.testing.assert_allclose(
                np.asarray(hs.wgts[i].lw), np.asarray(hp.wgts[i].lw),
                atol=1e-4)
        assert np.array_equal(
            np.asarray(hs.compute_trajectories()),
            np.asarray(hp.compute_trajectories()),
        )

    def test_rolling_window_longer_than_horizon(self):
        fk = self._fk(T=12)
        pf = particles.SMC(fk=fk, N=300, key=jax.random.key(2),
                           store_history=100)
        pf.run()
        assert pf.hist.T == 12
        # last frame is the final particle system
        np.testing.assert_allclose(
            np.asarray(pf.hist.X[-1]), np.asarray(pf.X), atol=1e-6)

    def test_partial_scan_matches_stepping(self):
        fk = self._fk()
        sel = lambda t: t % 10 == 0  # noqa: E731
        p1 = particles.SMC(fk=fk, N=800, key=jax.random.key(3),
                           store_history=sel)
        assert p1._static_horizon
        p1.run()
        p2 = particles.SMC(fk=fk, N=800, key=jax.random.key(3),
                           store_history=sel)
        for _ in p2:
            pass
        assert sorted(p1.hist.X) == sorted(p2.hist.X) == [0, 10, 20]
        for t in p2.hist.X:
            np.testing.assert_allclose(
                np.asarray(p1.hist.X[t]), np.asarray(p2.hist.X[t]),
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(p1.hist.wgts[t].lw),
                np.asarray(p2.hist.wgts[t].lw), atol=1e-4)

    def test_partial_no_save_times(self):
        fk = self._fk(T=12)
        pf = particles.SMC(fk=fk, N=300, key=jax.random.key(4),
                           store_history=lambda t: False)
        pf.run()
        assert pf.hist.X == {}

    def test_rolling_under_sqmc(self):
        fk = self._fk(T=15)
        pf = particles.SQMC(fk=fk, N=512, key=jax.random.key(5),
                            store_history=4)
        pf.run()
        assert pf.hist.T == 4
        np.testing.assert_allclose(
            np.asarray(pf.hist.X[-1]), np.asarray(pf.X), atol=1e-6)
        B = np.asarray(pf.hist.compute_trajectories())
        assert B.shape == (4, 512)

    def test_invalid_option_raises(self):
        with pytest.raises(ValueError):
            particles.SMC(fk=self._fk(), N=100, store_history=-3)


class TestFFBSGatherFreeKernelPath:
    """Round 5 (VERDICT r4 task 3): the gather-free backward_sampling_mcmc
    body (take_by_sort / take_sorted / multinomial_iid_values) must be
    REALISATION-equivalent to the plain-gather CPU path — interpret-mode
    kernels, same key, identical trajectories."""

    def test_kernel_path_matches_plain_gathers(self):
        from tests.test_resampling import TestMultinomialIIDFastPath as TP

        import particles_tpu as particles
        from particles_tpu import kalman
        from particles_tpu import state_space_models as ssms

        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        _, y = ssm.simulate(jax.random.key(0), 6)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        N = 2048  # kernel-routable size
        pf = particles.SMC(fk=fk, N=N, store_history=True,
                           key=jax.random.key(1))
        pf.run()
        key = jax.random.key(7)
        plain = np.asarray(pf.hist.backward_sampling_mcmc(key, N))
        helper = TP()
        origs = helper._patched()
        try:
            served = np.asarray(pf.hist.backward_sampling_mcmc(key, N))
        finally:
            helper._restore(origs)
        np.testing.assert_array_equal(served, plain)
