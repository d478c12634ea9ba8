"""Bayesian variable selection on the Concrete dataset: prior comparison.

TPU-native counterpart of papers/binarySMC/concrete.py (Chopin & Dau,
waste-free binary SMC experiments): adaptive-tempering SMC over the
2^p model space of a Gaussian linear regression on the real Concrete
compressive-strength data, comparing the standard inverse-gamma
prior (``BayesianVS``) against the g-prior variant
(``BayesianVS_gprior``).

Asserted outcomes: both runs produce finite log-marginal-likelihoods,
valid inclusion probabilities, and agree on the top predictors (the
paper's point that the posterior mode is robust across these priors —
cement and age dominate concrete strength).
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
from particles_tpu import binary_smc as bin_smc
from particles_tpu import datasets
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp


def _run(model_cls, X, y, p, N, key):
    prior = dists.StructDist({"gamma": dists.IID(bin_smc.Bernoulli(p=0.5),
                                                 p)})
    model = model_cls(data=(X, y), prior=prior)
    move = ssp.MCMCSequenceWF(mcmc=bin_smc.BinaryMetropolis(), len_chain=4)
    fk = ssp.AdaptiveTempering(model=model, len_chain=4, move=move,
                               ESSrmin=0.5)
    pf = particles.SMC(fk=fk, N=N, key=key)
    pf.run()
    W = np.asarray(pf.wgts.W)
    g = np.asarray(pf.X.theta["gamma"], dtype=np.float64)
    return float(pf.logLt), g.T @ W


def main(small=False):
    ds = datasets.Concrete()
    X, y = ds.data
    y = y - y.mean()
    if small:
        X, y = X[:200], y[:200]
    p = X.shape[1]
    N = 80 if small else 300
    print(f"Concrete: n={X.shape[0]}, p={p} "
          f"({'synthetic surrogate' if ds.synthetic else 'real data'})")

    out = {}
    for name, cls in (("invgamma", bin_smc.BayesianVS),
                      ("g-prior", bin_smc.BayesianVS_gprior)):
        logLt, incl = _run(cls, X, y, p, N, jax.random.key(3))
        out[name] = (logLt, incl)
        top = np.argsort(-incl)[:4]
        print(f"{name:>9}: logLt={logLt:9.2f}  top predictors {list(top)} "
              f"(incl {np.round(incl[top], 2)})")
        assert np.isfinite(logLt)
        assert np.all((incl >= 0) & (incl <= 1 + 1e-6))

    # the two priors agree on the leading predictors
    top_a = set(np.argsort(-out["invgamma"][1])[:3])
    top_b = set(np.argsort(-out["g-prior"][1])[:3])
    assert len(top_a & top_b) >= 2, (top_a, top_b)
    return out


if __name__ == "__main__":
    main()
