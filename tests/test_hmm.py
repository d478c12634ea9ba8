"""Tests for the Baum-Welch oracle and PF-vs-HMM cross-checks."""

import numpy as np

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import hmm as hmms
from particles_tpu import state_space_models as ssms


def make_hmm():
    trans = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    return hmms.GaussianHMM(
        trans_mat=trans, mus=jnp.array([-1.0, 1.0]), sigmas=jnp.array([0.5, 0.5])
    )


def brute_force_loglik(hmm_model, y):
    """Exact log-likelihood by brute-force enumeration (numpy float64)."""
    import itertools
    import scipy.stats as st

    trans = np.asarray(hmm_model.trans_mat, np.float64)
    init = np.asarray(hmm_model.init_dist, np.float64)
    mus = np.asarray(hmm_model.mus, np.float64)
    sigmas = np.asarray(hmm_model.sigmas, np.float64)
    T = len(y)
    total = 0.0
    for path in itertools.product(range(2), repeat=T):
        p = init[path[0]]
        for t in range(1, T):
            p *= trans[path[t - 1], path[t]]
        for t in range(T):
            p *= st.norm(mus[path[t]], sigmas[path[t]]).pdf(float(y[t]))
        total += p
    return np.log(total)


class TestBaumWelch:
    def test_loglik_vs_bruteforce(self):
        model = make_hmm()
        x, y = model.simulate(jax.random.key(0), 8)
        bw = hmms.BaumWelch(hmm=model, data=y)
        bw.forward()
        np.testing.assert_allclose(
            float(bw.logLt), brute_force_loglik(model, np.asarray(y)), rtol=1e-4
        )

    def test_filt_normalised(self):
        model = make_hmm()
        _, y = model.simulate(jax.random.key(1), 30)
        bw = hmms.BaumWelch(hmm=model, data=y)
        bw.run()
        np.testing.assert_allclose(np.asarray(bw.filt).sum(axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bw.smth).sum(axis=1), 1.0, rtol=1e-5)
        # final smoothing equals final filtering
        np.testing.assert_allclose(
            np.asarray(bw.smth[-1]), np.asarray(bw.filt[-1]), rtol=1e-5
        )

    def test_smoothing_vs_bruteforce_marginal(self):
        """Marginal smoothing P(X_t = k | y_{0:T-1}) vs enumeration."""
        import itertools
        import scipy.stats as st

        model = make_hmm()
        _, y = model.simulate(jax.random.key(2), 6)
        bw = hmms.BaumWelch(hmm=model, data=y)
        bw.run()
        trans = np.asarray(model.trans_mat, np.float64)
        init = np.asarray(model.init_dist, np.float64)
        mus, sigmas = np.asarray(model.mus), np.asarray(model.sigmas)
        T = 6
        marg = np.zeros((T, 2))
        for path in itertools.product(range(2), repeat=T):
            p = init[path[0]]
            for t in range(1, T):
                p *= trans[path[t - 1], path[t]]
            for t in range(T):
                p *= st.norm(mus[path[t]], sigmas[path[t]]).pdf(float(y[t]))
            for t in range(T):
                marg[t, path[t]] += p
        marg /= marg.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(bw.smth), marg, atol=1e-4)

    def test_sample_consistency(self):
        """Posterior trajectory samples match marginal smoothing freqs."""
        model = make_hmm()
        _, y = model.simulate(jax.random.key(3), 10)
        bw = hmms.BaumWelch(hmm=model, data=y)
        bw.run()
        paths = bw.sample(jax.random.key(4), N=4000)
        assert paths.shape == (10, 4000)
        freqs = np.asarray((paths == 1).mean(axis=1))
        np.testing.assert_allclose(freqs, np.asarray(bw.smth)[:, 1], atol=0.05)

    def test_pf_matches_baumwelch(self):
        """Bootstrap PF on the HMM recovers the exact logLt."""
        model = make_hmm()
        _, y = model.simulate(jax.random.key(5), 25)
        bw = hmms.BaumWelch(hmm=model, data=y)
        exact = float(bw.logLt)
        logLts = []
        for s in range(10):
            pf = particles.SMC(
                fk=ssms.Bootstrap(ssm=model, data=y), N=2000,
                key=jax.random.key(s),
            )
            pf.run()
            logLts.append(float(pf.logLt))
        assert abs(np.mean(logLts) - exact) < 0.1, (np.mean(logLts), exact)
