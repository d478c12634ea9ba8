"""Single-run variance estimates for waste-free SMC (tempering).

TPU-native counterpart of papers/wastefreeSMC/variance_estimates_
tempering.py (Dau & Chopin 2022): waste-free SMC keeps ALL N = M*P chain
states, which makes a *single run* enough to estimate the asymptotic
variance of its own estimates — the M resampled seeds behave like M
stationary chains of length P, so MCMC variance estimators (Geyer
initial-sequence) apply.

Study: adaptive tempering on a conjugate Gaussian-mean target (exact
evidence and posterior known).  We (a) collect the single-run Var_phi /
Var_logLt estimates, (b) replicate the sampler and check the single-run
estimates predict the empirical across-run variance within an order of
magnitude (the paper's headline claim), at two chain lengths P.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np
import scipy.stats as st

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp


class GaussMean(ssp.StaticModel):
    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(self.data[t])


def main(small=False):
    rng = np.random.default_rng(0)
    T = 20 if small else 30
    y = rng.normal(loc=1.0, size=T).astype(np.float32)
    prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
    model = GaussMean(data=y, prior=prior)
    post_var = 1.0 / (1.0 + T)
    post_mean = post_var * y.sum()
    nruns = 6 if small else 20
    N = 50 if small else 100
    phi = lambda X: np.asarray(X.theta["mu"])  # noqa: E731

    for P in ((5,) if small else (5, 20)):
        var_est, means, logLts = [], [], []
        for s in range(nruns):
            pf = particles.SMC(
                fk=ssp.AdaptiveTempering(model=model, len_chain=P),
                N=N, key=jax.random.key(100 * P + s),
                collect=[ssp.Var_phi(phi=phi)],
            )
            pf.run()
            var_est.append(float(pf.summaries.var_phi[-1]))
            W = np.asarray(pf.wgts.W)
            means.append(float(np.sum(W * phi(pf.X))))
            logLts.append(float(pf.logLt))
        # single-run estimate of N*Var(posterior-mean estimate)
        est = np.mean(var_est) / (N * P)
        emp = np.var(means)
        print(f"P={P:3d}: E[mu]={np.mean(means):+.3f} (exact {post_mean:+.3f})"
              f"  single-run var {est:.2e} vs empirical {emp:.2e}")
        assert np.isfinite(var_est).all() and np.all(np.asarray(var_est) > 0)
        assert abs(np.mean(means) - post_mean) < 5 * np.sqrt(emp + 1e-12) + 0.05
        if not small:
            # the paper's claim: the single-run estimate is in the right
            # ballpark (same order of magnitude as the empirical variance)
            assert 0.1 < est / emp < 10.0, (P, est, emp)
    return est, emp


if __name__ == "__main__":
    main()
