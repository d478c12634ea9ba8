"""PMMH parameter inference for a stochastic-volatility model.

TPU-native counterpart of book/pmcmc/pmmh_lingauss.py-style experiments —
the reference quotes >10h of CPU for 1e5-iteration studies; here the whole
chain (with a full inner particle filter per iteration) is one compiled
lax.scan.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import time

import numpy as np

import jax

from particles_tpu import distributions as dists
from particles_tpu import mcmc
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 50 if small else 200
    Nx = 50 if small else 200
    niter = 200 if small else 3000
    true = ssms.StochVol(mu=-1.0, rho=0.9, sigma=0.3)
    x, y = true.simulate(jax.random.key(0), T)

    prior = dists.StructDist({
        "mu": dists.Normal(scale=2.0),
        "rho": dists.Uniform(a=-0.99, b=0.99),
        "sigma": dists.Gamma(a=2.0, b=4.0),
    })

    m = mcmc.PMMH(
        ssm_cls=ssms.StochVol, prior=prior, data=y, Nx=Nx, niter=niter,
        key=jax.random.key(1),
    )
    t0 = time.perf_counter()
    m.run()
    print(f"{niter} PMMH iterations (Nx={Nx}, T={T}) in {m.cpu_time:.1f}s "
          f"(acc rate {m.acc_rate:.2f})")
    burn = niter // 3
    out = {}
    for par, truth in (("mu", -1.0), ("rho", 0.9), ("sigma", 0.3)):
        chain = np.asarray(m.chain.theta[par])[burn:]
        out[par] = (chain.mean(), chain.std())
        print(f"  {par:6s}: posterior {chain.mean():+.3f} "
              f"+/- {chain.std():.3f}   (truth {truth:+.3f})")
    # the chain must move and stay in a sane region
    assert 0.0 < float(m.acc_rate) < 0.9, m.acc_rate
    assert np.all(np.abs(np.asarray(m.chain.theta["rho"])[burn:]) < 1.0)
    if not small:
        assert abs(out["mu"][0] - (-1.0)) < 3 * out["mu"][1] + 0.5
    return out


if __name__ == "__main__":
    main()
