"""Binary SMC vs exact enumeration on a small variable-selection problem.

TPU-native counterpart of papers/binarySMC/toy.py (Schafer & Chopin
2013): with p=5 predictors the 2^p = 32 models can be enumerated exactly,
so the waste-free adaptive-tempering sampler's marginal inclusion
probabilities can be checked against the truth (and the bar-plot of
bar_plots.py is just these two vectors side by side).

TPU design: the exact enumeration is ONE batched masked-Cholesky call
over all 32 gammas (the same kernel the sampler itself uses), and each
replicate run is a single compiled sampler program.

Asserted outcomes: across replicates the mean absolute error of the
estimated inclusion probabilities is small (< 0.05 full / < 0.12 smoke),
and the truly active predictors (0, 1, 2) are ranked above the inactive
ones.
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
from particles_tpu import distributions as dists
from particles_tpu import resampling as rs
from particles_tpu import smc_samplers as ssp


def main(small=False):
    rng = np.random.default_rng(4)
    n, p = 30, 5
    preds = rng.standard_normal((n, p))
    preds[:, 0] = 1.0  # intercept
    response = preds[:, :3].sum(axis=1) + 0.8 * rng.standard_normal(n)

    prior = dists.StructDist({"gamma": dists.IID(bin_smc.Bernoulli(p=0.5), p)})
    model = bin_smc.BayesianVS(data=(preds, response), prior=prior)

    # exact answer by complete enumeration (32 models, one batched call)
    gammas, lp = model.complete_enum()
    probs = np.asarray(rs.exp_and_normalise(lp))
    exact = np.average(np.asarray(gammas, np.float64), weights=probs, axis=0)

    P = 20 if small else 100
    M = 32 if small else 100          # N = M*P chain states
    nruns = 2 if small else 3
    move = ssp.MCMCSequenceWF(mcmc=bin_smc.BinaryMetropolis(), len_chain=P)
    fk = ssp.AdaptiveTempering(model=model, len_chain=P, move=move)

    ests = []
    for s in range(nruns):
        pf = particles.SMC(fk=fk, N=M, key=jax.random.key(s))
        pf.run()
        W = np.asarray(pf.wgts.W)
        g = np.asarray(pf.X.theta["gamma"], np.float64)
        ests.append(g.T @ W)
    est = np.mean(ests, axis=0)

    abs_err = np.abs(est - exact)
    print("exact inclusion probs:", np.round(exact, 3))
    print("SMC   inclusion probs:", np.round(est, 3))
    print("mean absolute error  :", abs_err.mean())
    assert abs_err.mean() < (0.12 if small else 0.05), abs_err
    # active predictors 0..2 beat inactive 3..4 (bar_plots.py's picture)
    assert est[:3].min() > est[3:].max(), est
    return est, exact


if __name__ == "__main__":
    main()
