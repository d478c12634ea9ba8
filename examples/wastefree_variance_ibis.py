"""Single-run variance estimates in waste-free IBIS (Pima logistic reg).

TPU-native counterpart of papers/wastefreeSMC/variance_estimates_ibis.py
(Dau & Chopin 2022): IBIS processes the Pima observations sequentially;
with waste-free moves, the M resampled seeds act like M stationary
chains, so the Var_logLt / Var_phi collectors produce a *per-time-t*
estimate of the Monte-Carlo variance of the running log-evidence and of
the posterior-mean of the intercept — from ONE run.

TPU design: each replicate is a single compiled sampler run (collectors
live inside the step), and the replicate loop is trivially batchable;
the whole study is a handful of device programs.

Asserted outcomes: variance estimates are positive, finite, and grow
with t (more data processed = more resampling events accumulated); and
averaged over runs the single-run estimate of the across-run variance of
logLt is the right order of magnitude (the paper's headline claim).
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import collectors as col
from particles_tpu import datasets
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp


class LogisticRegression(ssp.StaticModel):
    """Sign-flipped single-datum likelihood (the dataset pre-multiplies
    each row by its +-1 response), reference variance_estimates_ibis.py:64-69."""

    def logpyt(self, theta, t):
        lin = jnp.matmul(theta["beta"], self.data[t])
        return -jnp.logaddexp(0.0, -lin)


def main(small=False):
    data = np.asarray(datasets.Pima().data, np.float32)
    if small:
        data = data[:60]
    T, p = data.shape
    scales = 5.0 * np.ones(p)
    scales[0] = 20.0  # intercept gets a wider prior
    prior = dists.StructDist(
        {"beta": dists.MvNormal(scale=scales, cov=np.eye(p))})
    model = LogisticRegression(data=data, prior=prior)

    M = 8 if small else 25
    P = 25 if small else 400   # N0 = M * P total chain states
    nruns = 4 if small else 12
    phi = lambda X: np.asarray(X.theta["beta"][:, 0])  # noqa: E731

    logLts, var_logLt, var_phi = [], [], []
    for s in range(nruns):
        pf = particles.SMC(
            fk=ssp.IBIS(model=model, len_chain=P), N=M,
            key=jax.random.key(s),
            collect=[col.Moments(), ssp.Var_logLt(),
                     ssp.Var_phi(phi=phi)],
        )
        pf.run()
        logLts.append(np.asarray(pf.summaries.logLts))
        var_logLt.append(np.asarray(pf.summaries.var_logLt))
        var_phi.append(np.asarray(pf.summaries.var_phi))
    logLts, var_logLt = np.array(logLts), np.array(var_logLt)
    var_phi = np.array(var_phi)

    N0 = M * P
    est = var_logLt[:, -1].mean() / N0
    emp = logLts[:, -1].var()
    print(f"IBIS Pima T={T} M={M} P={P}: logLt = {logLts[:, -1].mean():.2f}"
          f" +- {logLts[:, -1].std():.2f}")
    print(f"single-run var(logLt)/N0 = {est:.3e}  "
          f"empirical across {nruns} runs = {emp:.3e}")

    assert np.isfinite(var_logLt).all() and (var_logLt >= 0).all()
    assert np.isfinite(var_phi).all()
    # variance accumulates along the data path
    assert var_logLt[:, -1].mean() > var_logLt[:, T // 4].mean()
    if not small:
        assert 0.05 < est / (emp + 1e-12) < 20.0, (est, emp)
    return est, emp


if __name__ == "__main__":
    main()
