"""Basic tutorial: running a particle filter.

Mirrors the reference's ``basic_tutorial.ipynb``: define a state-space
model as a class, simulate data from it, wrap it into a Bootstrap
Feynman-Kac model, run the SMC engine, and inspect the outputs (log
likelihood, effective sample size, on-line moments, history).

Run it:  PYTHONPATH=. python docs/tutorials/01_basic_tutorial.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import collectors as col
from particles_tpu import distributions as dists
from particles_tpu import state_space_models as ssms


# 1. A state-space model is a class: PX0 (initial law), PX (transition),
# PY (observation law), each returning a distribution object.  Parameters
# declared in `default_params` become attributes (and pytree leaves, so
# changing their values never triggers recompilation).
class StochVol(ssms.StateSpaceModel):
    default_params = {"mu": -1.0, "rho": 0.95, "sigma": 0.2}

    def PX0(self):
        return dists.Normal(loc=self.mu,
                            scale=self.sigma / jnp.sqrt(1 - self.rho**2))

    def PX(self, t, xp):
        return dists.Normal(loc=self.mu + self.rho * (xp - self.mu),
                            scale=self.sigma)

    def PY(self, t, xp, x):
        return dists.Normal(loc=0.0, scale=jnp.exp(0.5 * x))


def main(small=False):
    T = 50 if small else 200
    N = 200 if small else 2000

    # 2. Simulate data.  Randomness is explicit: pass a PRNG key.
    # sigma=0.5 gives the latent log-variance visible swings (stationary
    # sd ~ 1.1), so the filter has something to track
    ssm = StochVol(rho=0.9, sigma=0.5)
    x_true, y = ssm.simulate(jax.random.key(0), T)

    # 3. Wrap model + data into a Feynman-Kac object and run the filter.
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    pf = particles.SMC(fk=fk, N=N, resampling="systematic", ESSrmin=0.5,
                       collect=[col.Moments()], store_history=True,
                       key=jax.random.key(1))
    pf.run()   # the whole filter compiles to one lax.scan

    # 4. Outputs: logLt, per-step summaries, moments, history.
    ess = np.asarray(pf.summaries.ESSs)
    rs = np.asarray(pf.summaries.rs_flags)
    means = np.asarray(pf.summaries.moments["mean"])
    print(f"log L_T           : {float(pf.logLt):.2f}")
    print(f"final ESS         : {ess[-1]:.0f} / {N}")
    print(f"resampling rate   : {rs.mean():.0%} of steps")
    print(f"filter mean corr  : "
          f"{np.corrcoef(means, np.asarray(x_true))[0, 1]:.2f}")

    assert np.isfinite(float(pf.logLt))
    assert ess.shape == (T,) and (ess >= 1).all()
    # the filtering means track the latent volatility (correlation is
    # moderate: squared-return observations are weakly informative)
    assert np.corrcoef(means, np.asarray(x_true))[0, 1] > 0.2

    # 5. The history records the full particle system per step; smoothing
    # algorithms consume it (see the smoothing example/tutorial).
    assert pf.hist.X.shape == (T, N)
    return pf


if __name__ == "__main__":
    main()
