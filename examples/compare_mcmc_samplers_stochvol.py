"""PMMH vs Particle Gibbs on a stochastic-volatility model.

TPU-native counterpart of book/mcmc/compare_mcmc_samplers_stochvol.py
(Chapter 16's comparison of particle MCMC samplers): the same StochVol
posterior over mu is targeted by

* **PMMH** — pseudo-marginal random-walk Metropolis, the inner bootstrap
  filter's logLt estimate in the acceptance ratio (one compiled nested
  scan for the whole chain), and
* **Particle Gibbs** — conditional SMC refreshes the volatility path,
  then Metropolis-within-Gibbs updates mu from its full conditional
  given that path.

Both chains are invariant for the exact same posterior, so their
post-burn-in means must agree — that agreement (not a closed form, which
doesn't exist here) is the asserted outcome, as in the book.
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

from particles_tpu import datasets
from particles_tpu import distributions as dists
from particles_tpu import mcmc
from particles_tpu import state_space_models as ssms


class SVfixed(ssms.StochVol):
    """mu free; rho/sigma fixed (keeps the study one-dimensional)."""

    default_params = {"mu": -1.0, "rho": 0.9, "sigma": 0.3}


class PGStochVol(mcmc.ParticleGibbs):
    def log_cond(self, theta, x):
        ssm = self.ssm_cls(**theta)
        lp = dists.Normal(loc=-1.0, scale=2.0).logpdf(theta["mu"])
        lp = lp + ssm.PX0().logpdf(x[0])
        lp = lp + jnp.sum(ssm.PX(1, x[:-1]).logpdf(x[1:]))
        return lp

    def update_theta(self, key, theta, x):
        th = {"mu": jnp.asarray(theta["mu"])}
        lp = self.log_cond(th, x)
        for _ in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            prop = {"mu": th["mu"] + 0.2 * jax.random.normal(k1, ())}
            lp_prop = self.log_cond(prop, x)
            if float(jnp.log(jax.random.uniform(k2, ()))) < float(
                    lp_prop - lp):
                th, lp = prop, lp_prop
        return th


def main(small=False):
    ds = datasets.GBP_vs_USD_9798()
    y = jnp.asarray(ds.data, jnp.float32)[: 40 if small else 150]
    niter = (60, 25) if small else (800, 150)  # (PMMH, PG)
    Nx = 50 if small else 100
    prior = dists.StructDist({"mu": dists.Normal(loc=-1.0, scale=2.0)})

    pm = mcmc.PMMH(ssm_cls=SVfixed, prior=prior, data=y, Nx=Nx,
                   niter=niter[0], key=jax.random.key(1))
    pm.run()
    mu_pm = np.asarray(pm.chain.theta["mu"])[niter[0] // 4:]
    print(f"PMMH:           E[mu]={mu_pm.mean():+.3f} "
          f"(sd {mu_pm.std():.3f}, acc {pm.acc_rate:.1%}, "
          f"{pm.cpu_time:.1f}s)")

    pg = PGStochVol(ssm_cls=SVfixed, prior=prior, data=y, Nx=Nx,
                    niter=niter[1], key=jax.random.key(2))
    pg.run()
    mu_pg = np.asarray(pg.chain.theta["mu"])[niter[1] // 4:]
    print(f"Particle Gibbs: E[mu]={mu_pg.mean():+.3f} "
          f"(sd {mu_pg.std():.3f}, {pg.cpu_time:.1f}s)")

    assert np.isfinite(mu_pm).all() and np.isfinite(mu_pg).all()
    # both samplers target the same posterior: means agree within a few
    # Monte-Carlo standard errors
    tol = 1.0 if small else 0.5
    assert abs(mu_pm.mean() - mu_pg.mean()) < tol, (mu_pm.mean(),
                                                    mu_pg.mean())
    return mu_pm.mean(), mu_pg.mean()


if __name__ == "__main__":
    main()
