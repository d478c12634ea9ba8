"""Bayesian estimation of state-space model parameters.

Mirrors ``Bayes_estimation_ssm.ipynb``: given data from a state-space
model with unknown parameters, run (a) PMMH — a Metropolis sampler whose
likelihood evaluations are particle-filter estimates — and (b) SMC² — an
IBIS over theta-particles, each carrying its own particle filter.  Both
need only the model class, a prior, and the data.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import kalman
from particles_tpu import mcmc
from particles_tpu import smc_samplers as ssp


def main(small=False):
    T = 25 if small else 60
    true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.3)
    x, y = true.simulate(jax.random.key(0), T)

    # the parameter(s) to infer, with a prior as a StructDist over a dict
    class LG(kalman.LinearGauss):
        default_params = {"rho": 0.5, "sigmaX": 1.0, "sigmaY": 0.3,
                          "sigma0": None}

    prior = dists.StructDist({"rho": dists.Uniform(a=-1.0, b=1.0)})

    # (a) PMMH: the whole chain (with the inner particle filter nested)
    # runs as one compiled scan
    pm = mcmc.PMMH(ssm_cls=LG, prior=prior, data=y,
                   Nx=50 if small else 200,
                   niter=100 if small else 500,
                   key=jax.random.key(1))
    pm.run()
    chain = np.asarray(pm.chain.theta["rho"])
    burn = len(chain) // 3
    post_mean = chain[burn:].mean()
    print(f"PMMH: E[rho | y] ~= {post_mean:.3f} (true 0.8), "
          f"acc rate {pm.acc_rate:.0%}")
    assert abs(post_mean - 0.8) < 0.35

    # (b) SMC2: sequential (evidence as a by-product, online in T)
    fk2 = ssp.SMC2(ssm_cls=LG, prior=prior, data=y,
                   init_Nx=30 if small else 100)
    alg = particles.SMC(fk=fk2, N=50 if small else 200,
                        key=jax.random.key(2))
    alg.run()
    th = alg.X.theta["rho"]
    W = np.asarray(alg.wgts.W)
    smc2_mean = float((W * np.asarray(th)).sum())
    print(f"SMC2: E[rho | y] ~= {smc2_mean:.3f}, "
          f"log evidence {float(alg.logLt):.2f}")
    assert abs(smc2_mean - 0.8) < 0.35
    assert np.isfinite(float(alg.logLt))
    return {"pmmh": chain, "smc2_mean": smc2_mean}


if __name__ == "__main__":
    main()
