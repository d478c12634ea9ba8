"""Waste-free SMC: how to split a fixed budget N = M x P.

TPU-native counterpart of papers/wastefreeSMC's chain-length experiments
(nr_mcmc_steps.py / logistic.py, Dau & Chopin 2022): waste-free SMC keeps
all N = M*P chain states, so the design question is how many resampled
seeds M vs how many MCMC steps P to run at a fixed particle budget.
The paper's finding: performance is remarkably ROBUST to the split —
a wide range of P gives near-identical estimator quality — which is what
makes waste-free SMC practical (no tuning cliff).

Study: adaptive tempering on a conjugate Gaussian-mean posterior (exact
evidence known).  For several splits of the same budget, compare the
spread of log-evidence estimates across independent runs.  Asserted: all
splits are unbiased within Monte-Carlo error, and no split's RMSE is an
order of magnitude worse than the best (the robustness claim).
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
    cov = np.eye(T) + np.ones((T, T))
    exact_ev = st.multivariate_normal(np.zeros(T), cov).logpdf(y)

    budget = 200 if small else 1000
    splits = (2, 10) if small else (2, 5, 20, 50)   # P values
    nruns = 5 if small else 12
    rmse = {}
    for P in splits:
        M = budget // P
        vals = []
        for s in range(nruns):
            pf = particles.SMC(
                fk=ssp.AdaptiveTempering(model=model, len_chain=P),
                N=M, key=jax.random.key(1000 * P + s))
            pf.run()
            vals.append(float(pf.logLt))
        vals = np.asarray(vals)
        rmse[P] = float(np.sqrt(np.mean((vals - exact_ev) ** 2)))
        print(f"P={P:3d} (M={M:4d}): E[logLt]={vals.mean():8.3f} "
              f"(exact {exact_ev:8.3f})  RMSE {rmse[P]:.3f}")
        assert np.isfinite(vals).all()
        assert abs(vals.mean() - exact_ev) < 4 * vals.std() / np.sqrt(
            nruns) + 0.3
    # robustness: no split is an order of magnitude worse than the best
    best = min(rmse.values())
    assert max(rmse.values()) < 10 * max(best, 1e-3), rmse
    return rmse


if __name__ == "__main__":
    main()
