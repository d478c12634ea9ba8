"""End-to-end tests of the SMC engine against the exact Kalman oracle.

This is the house verification style of the reference (SURVEY.md §4):
particle-filter estimates of the log-likelihood and filtering means on a
linear-Gaussian SSM must match the exact Kalman filter within Monte Carlo
tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import collectors
from particles_tpu import core
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


@pytest.fixture(scope="module")
def lg_setup():
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(42), 30)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    return ssm, y, kf


class TestKalman:
    def test_against_closed_form_t0(self, lg_setup):
        """At t=0: logp(y_0) = N(y_0; 0, sigma0^2 + sigmaY^2)."""
        ssm, y, kf = lg_setup
        import scipy.stats as st

        s2 = float(ssm.sigma0) ** 2 + float(ssm.sigmaY) ** 2
        np.testing.assert_allclose(
            float(kf.logpyt[0]),
            st.norm(0.0, np.sqrt(s2)).logpdf(float(y[0])),
            rtol=1e-4,
        )

    def test_filter_against_numpy_oracle(self, lg_setup):
        """Full scalar Kalman recursion re-derived in numpy float64."""
        ssm, y, kf = lg_setup
        rho, sX2, sY2 = 0.9, 1.0, 0.2**2
        m, P = 0.0, float(ssm.sigma0) ** 2
        yv = np.asarray(y).astype(np.float64)
        ms, Ps, lls = [], [], []
        first = True
        for yt in yv:
            if not first:
                m, P = rho * m, rho**2 * P + sX2
            first = False
            S = P + sY2
            lls.append(-0.5 * np.log(2 * np.pi * S) - 0.5 * (yt - m) ** 2 / S)
            K = P / S
            m = m + K * (yt - m)
            P = P * (1 - K)
            ms.append(m)
            Ps.append(P)
        np.testing.assert_allclose(
            np.asarray(kf.filt.mean)[:, 0], ms, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(kf.logpyt), lls, rtol=1e-3, atol=1e-4)

    def test_smoother_shapes_and_consistency(self, lg_setup):
        ssm, y, kf = lg_setup
        kf.smoother()
        T = y.shape[0]
        assert kf.smth.mean.shape == (T, 1)
        # smoothing at T-1 equals filtering at T-1
        np.testing.assert_allclose(
            np.asarray(kf.smth.mean[-1]), np.asarray(kf.filt.mean[-1]), rtol=1e-5
        )
        # smoothing variance <= filtering variance
        assert np.all(np.asarray(kf.smth.cov) <= np.asarray(kf.filt.cov) + 1e-6)

    def test_mv_matches_scalar(self, lg_setup):
        ssm, y, kf = lg_setup
        mv = kalman.MVLinearGauss(
            F=ssm.rho, G=1.0, covX=float(ssm.sigmaX) ** 2,
            covY=float(ssm.sigmaY) ** 2, cov0=float(ssm.sigma0) ** 2,
        )
        kf2 = kalman.Kalman(ssm=mv, data=y)
        kf2.filter()
        np.testing.assert_allclose(
            np.asarray(kf2.logpyt), np.asarray(kf.logpyt), rtol=1e-4, atol=1e-5
        )


def run_pf(fk_cls, ssm, y, N=2000, seed=1, **kwargs):
    fk = fk_cls(ssm=ssm, data=y)
    pf = particles.SMC(fk=fk, N=N, key=jax.random.key(seed), **kwargs)
    pf.run()
    return pf


class TestBootstrapVsKalman:
    def test_logLt(self, lg_setup):
        """PF logLt matches Kalman logLt within MC error, over 20 runs."""
        ssm, y, kf = lg_setup
        exact = float(kf.logLt)
        fk = ssms.Bootstrap(ssm=ssm, data=y)

        logLts = [
            float(run_pf(ssms.Bootstrap, ssm, y, N=1000, seed=s).logLt)
            for s in range(20)
        ]
        err = np.mean(logLts) - exact
        spread = np.std(logLts) / np.sqrt(len(logLts))
        assert abs(err) < 5 * spread + 0.05, (err, spread)

    def test_filter_mean(self, lg_setup):
        """Weighted particle mean at final t matches Kalman filter mean."""
        ssm, y, kf = lg_setup
        pf = run_pf(ssms.Bootstrap, ssm, y, N=20_000, seed=3)
        est = float(jnp.sum(pf.W * pf.X))
        exact = float(kf.filt.mean[-1, 0])
        assert abs(est - exact) < 0.05

    def test_moments_collector(self, lg_setup):
        ssm, y, kf = lg_setup
        pf = run_pf(
            ssms.Bootstrap, ssm, y, N=20_000, seed=4,
            collect=[collectors.Moments()],
        )
        means = np.asarray(pf.summaries.moments["mean"])
        exact = np.asarray(kf.filt.mean)[:, 0]
        assert means.shape == exact.shape
        np.testing.assert_allclose(means, exact, atol=0.08)

    def test_guided_and_apf(self, lg_setup):
        """Guided PF and APF are unbiased too, with smaller variance than
        bootstrap for informative observations."""
        ssm, y, kf = lg_setup
        exact = float(kf.logLt)
        for fk_cls in (ssms.GuidedPF, ssms.AuxiliaryPF, ssms.AuxiliaryBootstrap):
            logLts = [
                float(run_pf(fk_cls, ssm, y, N=1000, seed=s).logLt)
                for s in range(10)
            ]
            err = np.mean(logLts) - exact
            assert abs(err) < 0.2, (fk_cls.__name__, err, exact)
        # variance comparison: guided should beat bootstrap here (sigmaY small)
        boot = np.std(
            [float(run_pf(ssms.Bootstrap, ssm, y, N=500, seed=s).logLt)
             for s in range(10)]
        )
        guided = np.std(
            [float(run_pf(ssms.GuidedPF, ssm, y, N=500, seed=s).logLt)
             for s in range(10)]
        )
        assert guided < boot


class TestScaleRegressions:
    def test_apf_stochvol_large_n(self):
        """f32 regression (found at N>=2^17 on every backend): StochVol's
        Pitt-Shephard logeta reaches ~+90 in the deep-vol tail while the
        corresponding carry weights are ~exp(-120); the APF reset weight
        log_mean_exp(logeta, W) then underflowed to -inf under max(v)
        stabilisation, nuking every particle.  Assert the production-size
        run stays finite and agrees with a small-N run."""
        Tx = 60
        ssm = ssms.StochVol()
        _, data = ssm.simulate(jax.random.PRNGKey(7), Tx)
        fk = ssms.AuxiliaryBootstrap(ssm=ssm, data=data)
        lls = {}
        for N in (2048, 1 << 17):
            carry, _, _ = core._run_full(
                fk, jax.random.key(0), N, Tx, False, "systematic", 1.1,
                None, False)
            lls[N] = float(carry.logLt)
            assert np.isfinite(lls[N]), (N, lls[N])
        assert abs(lls[1 << 17] - lls[2048]) < 2.0, lls


class TestEngineBehaviour:
    def test_summaries_shapes(self, lg_setup):
        ssm, y, _ = lg_setup
        pf = run_pf(ssms.Bootstrap, ssm, y, N=100, seed=0)
        T = y.shape[0]
        assert pf.summaries.ESSs.shape == (T,)
        assert pf.summaries.logLts.shape == (T,)
        assert pf.summaries.rs_flags.shape == (T,)
        assert not bool(pf.summaries.rs_flags[0])  # never resample at t=0
        assert float(pf.summaries.logLts[-1]) == float(pf.logLt)
        # ESS is between 1 and N
        assert np.all(np.asarray(pf.summaries.ESSs) >= 1.0 - 1e-3)
        assert np.all(np.asarray(pf.summaries.ESSs) <= 100.0 + 1e-3)

    def test_essrmin_controls_resampling(self, lg_setup):
        ssm, y, _ = lg_setup
        always = run_pf(ssms.Bootstrap, ssm, y, N=200, seed=0, ESSrmin=1.1)
        never = run_pf(ssms.Bootstrap, ssm, y, N=200, seed=0, ESSrmin=0.0)
        assert np.asarray(always.summaries.rs_flags)[1:].all()
        assert not np.asarray(never.summaries.rs_flags).any()

    def test_step_by_step_matches_run(self, lg_setup):
        """Iterator protocol produces the same result as the scanned run."""
        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=300, key=jax.random.key(9))
        pf1.run()
        pf2 = particles.SMC(fk=fk, N=300, key=jax.random.key(9))
        for _ in range(5):
            next(pf2)
        for _ in pf2:  # finish via iteration
            pass
        # note: scan and stepping split keys identically
        np.testing.assert_allclose(
            float(pf1.logLt), float(pf2.logLt), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pf1.X), np.asarray(pf2.X), rtol=1e-4, atol=1e-5
        )

    def test_run_continues_after_stepping(self, lg_setup):
        """run() on a partially-stepped pf CONTINUES (reference
        semantics) — it must not restart the compiled scan from t=0,
        which would discard the completed steps and (since stepping
        advances self.key) replay a different randomness stream."""
        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=300, key=jax.random.key(9))
        next(pf1)
        next(pf1)
        pf1.run()
        pf2 = particles.SMC(fk=fk, N=300, key=jax.random.key(9))
        for _ in pf2:
            pass
        assert float(pf1.logLt) == float(pf2.logLt)
        assert pf1.t == y.shape[0]

    def test_store_history(self, lg_setup):
        ssm, y, _ = lg_setup
        pf = run_pf(ssms.Bootstrap, ssm, y, N=64, seed=0, store_history=True)
        T = y.shape[0]
        assert pf.hist.X.shape == (T, 64)
        assert pf.hist.A.shape == (T, 64)
        assert pf.hist.lw.shape == (T, 64)

    @pytest.mark.parametrize("scheme", ["multinomial", "stratified", "systematic", "ssp", "residual"])
    def test_resampling_schemes_in_engine(self, lg_setup, scheme):
        ssm, y, kf = lg_setup
        pf = run_pf(ssms.Bootstrap, ssm, y, N=500, seed=11, resampling=scheme)
        assert abs(float(pf.logLt) - float(kf.logLt)) < 1.5

    def test_collect_off(self, lg_setup):
        ssm, y, _ = lg_setup
        pf = run_pf(ssms.Bootstrap, ssm, y, N=100, seed=0, collect="off")
        assert pf.summaries is None
        assert np.isfinite(float(pf.logLt))

    def test_multivariate_model(self):
        ssm = kalman.MVLinearGauss_Guarniero_etal(alpha=0.4, dx=3)
        x, y = ssm.simulate(jax.random.key(7), 20)
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.filter()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        logLts = []
        for s in range(10):
            pf = particles.SMC(fk=fk, N=2000, key=jax.random.key(s))
            pf.run()
            logLts.append(float(pf.logLt))
        assert abs(np.mean(logLts) - float(kf.logLt)) < 0.3


class TestSimulate:
    def test_typoed_param_warns(self):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ssms.StochVol(rh=0.9)  # typo for rho
        assert any("did you mean 'rho'" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ssms.StochVol(rho=0.9)            # legit param
            ssms.StochVol(unrelated_extra=3)  # far from any param: silent
        assert not w

    def test_shapes_and_stats(self):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = ssm.simulate(jax.random.key(0), 200)
        assert x.shape == (200,)
        assert y.shape == (200,)
        # observations track states closely (sigmaY small)
        assert np.corrcoef(np.asarray(x), np.asarray(y))[0, 1] > 0.9

    def test_stochvol(self):
        ssm = ssms.StochVol()
        x, y = ssm.simulate(jax.random.key(0), 100)
        assert x.shape == (100,)
        assert np.isfinite(np.asarray(y)).all()


class TestMultiSMC:
    def test_basic(self, lg_setup):
        ssm, y, kf = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        results = particles.multiSMC(fk=fk, N=500, nruns=8, key=jax.random.key(0))
        assert len(results) == 8
        logLts = [float(r["output"].logLt) for r in results]
        assert np.std(logLts) > 0  # distinct seeds
        assert abs(np.mean(logLts) - float(kf.logLt)) < 0.5

    def test_cartesian_options(self, lg_setup):
        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        results = particles.multiSMC(
            fk=fk, N=200, nruns=3,
            resampling=["multinomial", "systematic"],
            key=jax.random.key(0),
        )
        assert len(results) == 6
        schemes = {r["resampling"] for r in results}
        assert schemes == {"multinomial", "systematic"}
        assert all("run" in r for r in results)

    def test_seed_kwarg(self, lg_setup):
        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        r1 = particles.multiSMC(fk=fk, N=100, nruns=2, seed=7)
        r2 = particles.multiSMC(fk=fk, N=100, nruns=2, seed=7)
        assert float(r1[0]["output"].logLt) == float(r2[0]["output"].logLt)

    def test_sampler_fk_through_multismc(self, lg_setup):
        """Reference parity (core.py:431-518): an SMC-sampler FK (IBIS)
        runs through multiSMC via the stepping engine."""
        from particles_tpu import distributions as dists
        from particles_tpu import smc_samplers as ssp

        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.normal(0.5, 1.0, size=30), jnp.float32)

        class GaussMean(ssp.StaticModel):
            def logpyt(self, theta, t):
                return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(
                    self.data[t])

        prior = dists.StructDist({"mu": dists.Normal(scale=3.0)})
        fk_ibis = ssp.IBIS(model=GaussMean(data=data, prior=prior),
                           len_chain=5)
        out = particles.multiSMC(fk=fk_ibis, N=50, nruns=2, seed=3)
        assert len(out) == 2
        vals = [float(r["output"].logLt) for r in out]
        assert all(np.isfinite(v) for v in vals)
        assert vals[0] != vals[1]  # distinct run keys

    def test_mixed_grid_and_extra_options(self, lg_setup):
        """A dict-valued fk mixing a filter and a sampler, plus an option
        outside the fast-path set (verbose), still runs every combo."""
        from particles_tpu import distributions as dists
        from particles_tpu import smc_samplers as ssp

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        rng = np.random.default_rng(1)
        data = jnp.asarray(rng.normal(size=20), jnp.float32)

        class GaussMean(ssp.StaticModel):
            def logpyt(self, theta, t):
                return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(
                    self.data[t])

        prior = dists.StructDist({"mu": dists.Normal(scale=3.0)})
        fk_ibis = ssp.IBIS(model=GaussMean(data=data, prior=prior),
                           len_chain=4)
        out = particles.multiSMC(fk={"boot": fk, "ibis": fk_ibis}, N=40,
                                 nruns=2, verbose=False, seed=11)
        assert len(out) == 4
        assert sorted(set(r["fk"] for r in out)) == ["boot", "ibis"]
        assert all(np.isfinite(float(r["output"].logLt)) for r in out)


class TestCheckpointResume:
    def test_roundtrip_bitwise(self, lg_setup):
        """Interrupt at t=8, checkpoint to disk, resume in a NEW object:
        bit-identical to an uninterrupted stepping run."""
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        ref = particles.SMC(fk=fk, N=150, key=jax.random.key(7))
        for _ in ref:
            pass
        pf1 = particles.SMC(fk=fk, N=150, key=jax.random.key(7))
        for _ in range(8):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=150, key=jax.random.key(99))
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert float(pf2.logLt) == float(ref.logLt)
        np.testing.assert_array_equal(np.asarray(pf2.X), np.asarray(ref.X))
        # summaries continue across the checkpoint
        assert len(pf2.summaries.ESSs) == y.shape[0]

    def test_save_before_step_raises(self, lg_setup):
        ssm, y, _ = lg_setup
        pf = particles.SMC(fk=ssms.Bootstrap(ssm=ssm, data=y), N=50)
        with pytest.raises(ValueError):
            pf.save_state("/tmp/nope.pkl")

    def test_sqmc_checkpoint_roundtrip(self, lg_setup):
        """SQMC resume carries the Hilbert order (regression)."""
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        ref = particles.SMC(fk=fk, N=128, qmc=True, key=jax.random.key(3))
        for _ in ref:
            pass
        pf1 = particles.SMC(fk=fk, N=128, qmc=True, key=jax.random.key(3))
        for _ in range(6):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_q.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=128, qmc=True, key=jax.random.key(0))
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert float(pf2.logLt) == float(ref.logLt)

    def test_history_checkpoint_roundtrip(self, lg_setup):
        """Full history survives a checkpoint (regression)."""
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=64, store_history=True,
                            key=jax.random.key(5))
        for _ in range(7):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_h.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=64, store_history=True,
                            key=jax.random.key(0))
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert pf2.hist.T == y.shape[0]  # includes pre-checkpoint frames

    def test_rolling_history_checkpoint_roundtrip(self, lg_setup):
        """Rolling history survives a checkpoint bitwise (round 4 closed
        the last checkpoint hole)."""
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        ref = particles.SMC(fk=fk, N=64, store_history=3,
                            key=jax.random.key(11))
        for _ in ref:
            pass
        pf1 = particles.SMC(fk=fk, N=64, store_history=3,
                            key=jax.random.key(11))
        for _ in range(7):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_r.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=64, store_history=3,
                            key=jax.random.key(0))
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert pf2.hist.T == ref.hist.T == 3
        for a, b in zip(pf2.hist.X, ref.hist.X):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(pf2.hist.A, ref.hist.A):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(pf2.logLt) == float(ref.logLt)

    def test_partial_history_checkpoint_roundtrip(self, lg_setup):
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        opt = lambda t: t % 4 == 0  # noqa: E731
        ref = particles.SMC(fk=fk, N=64, store_history=opt,
                            key=jax.random.key(12))
        for _ in ref:
            pass
        pf1 = particles.SMC(fk=fk, N=64, store_history=opt,
                            key=jax.random.key(12))
        for _ in range(6):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_p.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=64, store_history=opt,
                            key=jax.random.key(0))
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert sorted(pf2.hist.X) == sorted(ref.hist.X)
        for t in ref.hist.X:
            np.testing.assert_array_equal(np.asarray(pf2.hist.X[t]),
                                          np.asarray(ref.hist.X[t]))

    def test_windowed_checkpoint_into_bool_history_raises(self, lg_setup):
        import os
        import tempfile

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=32, store_history=3,
                            key=jax.random.key(1))
        next(pf1)
        next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_m.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=32, store_history=False)
        with pytest.raises(ValueError):
            pf2.load_state(path)


class TestMultiSMCHistoryOptions:
    """Regression (round 3): multiSMC must honor rolling/partial history
    options rather than silently degrading them to a full (T, N) stack."""

    def test_rolling_window(self, lg_setup):
        from particles_tpu import smoothing

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        out = particles.multiSMC(fk=fk, N=64, nruns=2, store_history=3,
                                 seed=0)
        assert len(out) == 2
        for r in out:
            h = r["output"].hist
            assert isinstance(h, smoothing.RollingParticleHistory)
            assert h.T == 3  # exactly the window, not the full horizon
            assert h.X[0].shape == (64,)

    def test_partial_save_times(self, lg_setup):
        from particles_tpu import smoothing

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        out = particles.multiSMC(
            fk=fk, N=64, nruns=2, store_history=lambda t: t % 10 == 0,
            seed=1)
        T = int(fk.T)
        for r in out:
            h = r["output"].hist
            assert isinstance(h, smoothing.PartialParticleHistory)
            assert sorted(h.X) == [t for t in range(T) if t % 10 == 0]


class TestRunnerCacheKey:
    """Regression: unhashable collector config must key the compiled-runner
    cache by VALUE (raw id() aliases entries after GC address reuse)."""

    def test_list_configs_hash_by_value(self):
        from particles_tpu.core import _hashable

        assert _hashable([1, 2, 3]) == _hashable([1, 2, 3])
        assert _hashable([1, 2, 3]) != _hashable([1, 2, 4])
        assert _hashable({"a": [1]}) == _hashable({"a": [1]})
        a1 = np.arange(4)
        assert _hashable(a1) == _hashable(np.arange(4))

    def test_unhashable_opaque_objects_stay_alive(self):
        import gc

        from particles_tpu.core import _hashable, _IdKey

        class Opaque:
            __hash__ = None  # unhashable, not a container

        k = _hashable(Opaque())
        assert isinstance(k, _IdKey)
        gc.collect()
        # the key HOLDS the object: its id cannot be recycled while cached
        assert k.obj is not None and k == k


class TestMomentsCheckpoint:
    """Regression: collector outputs may be pytrees (Moments: dicts) —
    save_state must round-trip them, not pickle object arrays."""

    def test_moments_roundtrip(self, lg_setup):
        import os
        import tempfile

        from particles_tpu import collectors

        ssm, y, _ = lg_setup
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=32, key=jax.random.key(3),
                            collect=[collectors.Moments()])
        for _ in range(3):
            next(pf1)
        path = os.path.join(tempfile.mkdtemp(), "ckpt_mom.pkl")
        pf1.save_state(path)
        pf2 = particles.SMC(fk=fk, N=32, key=jax.random.key(0),
                            collect=[collectors.Moments()])
        pf2.load_state(path)
        for _ in pf2:
            pass
        assert len(pf2.summaries.moments) == y.shape[0]
        m0 = pf2.summaries.moments[0]
        assert np.isfinite(float(m0["mean"]))
        assert np.isfinite(float(m0["var"]))
