"""SQMC's variance gain over SMC as the state dimension grows.

TPU-native counterpart of book/sqmc/sqmc_as_dim_grows.py (Gerber & Chopin
2015, Fig. 3-style): on multivariate linear-Gaussian models of growing
dimension, the RQMC gain is large for small d and decays as d grows —
while never doing worse than plain Monte Carlo.
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
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 10 if small else 20
    N = 100 if small else 300
    nreps = 6 if small else 16
    dims = (1, 2) if small else (1, 2, 5)
    gains = {}
    for d in dims:
        ssm = kalman.MVLinearGauss_Guarniero_etal(alpha=0.4, dx=d)
        x, y = ssm.simulate(jax.random.key(d), T)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        smc_lls, sqmc_lls = [], []
        for s in range(nreps):
            pf = particles.SMC(fk=fk, N=N, key=jax.random.key(10 * d + s))
            pf.run()
            smc_lls.append(float(pf.logLt))
            pfq = particles.SMC(fk=fk, N=N, qmc=True,
                                key=jax.random.key(900 + 10 * d + s))
            pfq.run()
            sqmc_lls.append(float(pfq.logLt))
        gains[d] = np.var(smc_lls) / max(np.var(sqmc_lls), 1e-12)
        print(f"d={d}: var(SMC) {np.var(smc_lls):.4f}  "
              f"var(SQMC) {np.var(sqmc_lls):.4f}  gain {gains[d]:6.1f}x")
    # SQMC at least matches MC everywhere (generous MC noise allowance)
    for d, g in gains.items():
        assert g > 0.5, (d, g)
    # and the gain is substantial in low dimension
    assert gains[min(dims)] > 1.5, gains
    return gains


if __name__ == "__main__":
    main()
