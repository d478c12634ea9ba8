"""More complicated state-space models: multivariate states, dict states,
and hierarchical priors.

Mirrors ``complicated_state_space_models.ipynb``: (a) a multivariate
linear-Gaussian model (state in R^d) filtered against its exact Kalman
answer; (b) the bearings-only tracking model (4-d state, nonlinear
observation); (c) composing a hierarchical prior with `StructDist` +
`Cond`, where one parameter's law depends on another.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


def main(small=False):
    # (a) multivariate linear-Gaussian vs exact Kalman
    T = 20 if small else 50
    N = 1000 if small else 5000
    ssm = kalman.MVLinearGauss_Guarniero_etal(alpha=0.4, dx=3)
    x, y = ssm.simulate(jax.random.key(0), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    pf = particles.SMC(fk=ssms.Bootstrap(ssm=ssm, data=y), N=N,
                       key=jax.random.key(1))
    pf.run()
    err = abs(float(pf.logLt) - float(kf.logLt))
    print(f"(a) MV d=3: |logLt - Kalman| = {err:.3f}")
    assert err < 1.0

    # (b) bearings-only tracking: 4-d state, nonlinear angle observation
    bo = ssms.BearingsOnly()
    xb, yb = bo.simulate(jax.random.key(2), 10 if small else 24)
    pfb = particles.SMC(fk=ssms.Bootstrap(ssm=bo, data=yb),
                        N=2000 if small else 10000, key=jax.random.key(3))
    pfb.run()
    print(f"(b) bearings-only: logLt = {float(pfb.logLt):.2f}")
    assert np.isfinite(float(pfb.logLt))

    # (c) hierarchical prior: sigma ~ Gamma, mu | sigma ~ N(0, sigma).
    # Order matters for the chain rule: pass an OrderedDict (a plain dict
    # is normalised to sorted-key order, which would sample mu first).
    from collections import OrderedDict
    prior = dists.StructDist(OrderedDict([
        ("sigma", dists.Gamma(a=2.0, b=2.0)),
        ("mu", dists.Cond(
            lambda th: dists.Normal(loc=0.0, scale=th["sigma"]))),
    ]))
    draws = prior.rvs(jax.random.key(4), size=5000)
    lp = prior.logpdf(draws)
    # E[mu^2] = E[sigma^2] = a(a+1)/b^2 = 1.5 for Gamma(2, 2)
    m2 = float(np.mean(np.asarray(draws["mu"]) ** 2))
    print(f"(c) hierarchical prior: E[mu^2] ~= {m2:.2f} (exact 1.5)")
    assert np.isfinite(np.asarray(lp)).all()
    assert abs(m2 - 1.5) < 0.25
    return {"mv_err": err, "m2": m2}


if __name__ == "__main__":
    main()
