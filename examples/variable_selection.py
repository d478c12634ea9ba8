"""Bayesian variable selection on the Boston housing dataset via binary SMC.

TPU-native counterpart of the reference's papers/binary* experiments:
adaptive tempering on {0,1}^p with a nested-logistic independent proposal
(fitted by masked ridge-IRLS instead of sklearn), marginal likelihoods via
one batched masked Cholesky per evaluation.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np

import jax

import particles_tpu as particles
from particles_tpu import binary_smc as bin_smc
from particles_tpu import datasets
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp


def main(small=False):
    ds = datasets.Boston()
    X, y = ds.data
    y = y - y.mean()
    if small:
        X, y = X[:150], y[:150]
    p = X.shape[1]
    N = 100 if small else 400
    print(f"Boston: n={X.shape[0]}, p={p} "
          f"({'synthetic surrogate' if ds.synthetic else 'real data'})")

    prior = dists.StructDist({"gamma": dists.IID(bin_smc.Bernoulli(p=0.5), p)})
    model = bin_smc.BayesianVS(data=(X, y), prior=prior)

    move = ssp.MCMCSequenceWF(mcmc=bin_smc.BinaryMetropolis(), len_chain=5)
    fk = ssp.AdaptiveTempering(model=model, len_chain=5, move=move,
                               ESSrmin=0.5)
    pf = particles.SMC(fk=fk, N=N, key=jax.random.key(0), verbose=not small)
    pf.run()

    W = np.asarray(pf.wgts.W)
    g = np.asarray(pf.X.theta["gamma"], dtype=np.float64)
    incl = g.T @ W
    print(f"\nlog marginal likelihood: {float(pf.logLt):.2f}")
    print("posterior inclusion probabilities:")
    order = np.argsort(-incl)
    for j in order[:8]:
        print(f"  predictor {j:2d}: {incl[j]:.3f}")
    assert np.isfinite(float(pf.logLt))
    assert np.all((incl >= 0) & (incl <= 1 + 1e-6))
    if not (small or ds.synthetic):
        # LSTAT (col 13 incl. intercept) and RM (col 6) dominate Boston
        # regressions; they must be among the top inclusion probabilities
        assert incl[13] > 0.9 or incl[6] > 0.9, incl
    return incl


if __name__ == "__main__":
    main()
