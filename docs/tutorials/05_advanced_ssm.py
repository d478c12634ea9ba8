"""Advanced state-space models: guided and auxiliary particle filters.

Mirrors ``advanced_tutorial_ssm.ipynb``: beyond the bootstrap filter, a
model can supply `proposal0`/`proposal` (a guided filter samples from
them instead of the prior transition) and `logeta` (an auxiliary filter
additionally twists the resampling weights one step ahead).  On a
linear-Gaussian model the optimal proposal is available in closed form,
so the variance reduction is measurable against the exact Kalman answer.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax

import particles_tpu as particles
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 30 if small else 100
    N = 100 if small else 500
    nreps = 6 if small else 20
    # LinearGauss ships optimal proposals + logeta (kalman.py)
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(0), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    exact = float(kf.logLt)

    variants = {
        "bootstrap": ssms.Bootstrap(ssm=ssm, data=y),
        "guided":    ssms.GuidedPF(ssm=ssm, data=y),
        "apf":       ssms.AuxiliaryPF(ssm=ssm, data=y),
    }
    sds = {}
    for name, fk in variants.items():
        lls = []
        for r in range(nreps):
            pf = particles.SMC(fk=fk, N=N, key=jax.random.key(100 + r))
            pf.run()
            lls.append(float(pf.logLt))
        lls = np.array(lls)
        sds[name] = lls.std()
        print(f"{name:10s}: logLt {lls.mean():9.3f} +- {lls.std():.3f}  "
              f"(exact {exact:.3f})")
        assert abs(lls.mean() - exact) < 5 * lls.std() / np.sqrt(nreps) + 0.5

    # guided/APF use the optimal proposal: much lower variance than
    # bootstrap at equal N (the point of the chapter)
    assert sds["guided"] < sds["bootstrap"], sds
    assert sds["apf"] < sds["bootstrap"], sds
    return sds


if __name__ == "__main__":
    main()
