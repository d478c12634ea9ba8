"""PMMH quality vs the number of particles Nx.

TPU-native counterpart of book/pmcmc/pmmh_cost.py (Chapter 16's Python
corner): the mixing of a PMMH chain depends on the variance of the
particle likelihood estimate, which shrinks with Nx.  Too small an Nx
gives a sticky chain (tiny acceptance); past a point, extra particles
buy little.  The chain itself compiles to one lax.scan per (niter, Nx),
so the whole study is a few device programs.
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

from particles_tpu import distributions as dists
from particles_tpu import kalman, mcmc


class ReparamLinGauss(kalman.LinearGauss):
    """LinearGauss parameterised by variances (as in the reference)."""

    def __init__(self, varX=1.0, varY=0.04, rho=0.0):
        super().__init__(sigmaX=jnp.sqrt(jnp.asarray(varX)),
                         sigmaY=jnp.sqrt(jnp.asarray(varY)), rho=rho)


def main(small=False):
    T = 25 if small else 100
    niter = 60 if small else 300
    Nxs = (3, 60) if small else (5, 50, 500)
    true = ReparamLinGauss(varX=1.0, varY=0.04, rho=0.9)
    x, y = true.simulate(jax.random.key(0), T)
    prior = dists.StructDist({"rho": dists.Uniform(a=-1.0, b=1.0)})

    acc = {}
    for Nx in Nxs:
        pm = mcmc.PMMH(ssm_cls=ReparamLinGauss, prior=prior, data=y,
                       Nx=Nx, niter=niter, key=jax.random.key(Nx))
        pm.run()
        acc[Nx] = float(pm.acc_rate)
        chain = np.asarray(pm.chain.theta["rho"])
        print(f"Nx={Nx:4d}: acceptance {acc[Nx]:5.1%}   "
              f"E[rho] {chain[niter // 3:].mean():+.3f} (true 0.9)")
        assert np.isfinite(chain).all()
    # more particles -> better likelihood estimates -> better acceptance
    assert acc[max(Nxs)] > acc[min(Nxs)], acc
    return acc


if __name__ == "__main__":
    main()
