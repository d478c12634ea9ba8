"""SQMC vs SMC: variance of the log-likelihood estimate at equal N.

TPU-native counterpart of the reference's SMC-vs-SQMC comparisons
(book/mle/compare_smc_sqmc_malik_and_pitt.py quotes 2-3h; this runs in
seconds).
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
    T = 20 if small else 50
    Ns = (100,) if small else (100, 400)
    nreps = 8 if small else 20
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(42), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    gains = {}
    for N in Ns:
        smc_lls, sqmc_lls = [], []
        for s in range(nreps):
            pf = particles.SMC(fk=fk, N=N, key=jax.random.key(s))
            pf.run()
            smc_lls.append(float(pf.logLt))
            pfq = particles.SMC(fk=fk, N=N, qmc=True,
                                key=jax.random.key(1000 + s))
            pfq.run()
            sqmc_lls.append(float(pfq.logLt))
        gains[N] = np.var(smc_lls) / np.var(sqmc_lls)
        print(f"N={N:5d}: var(SMC logLt) = {np.var(smc_lls):.4f}   "
              f"var(SQMC logLt) = {np.var(sqmc_lls):.4f}   "
              f"gain {gains[N]:5.1f}x   "
              f"(exact {float(kf.logLt):.2f})")
    # SQMC's whole point: lower logLt variance at equal N
    for N, g in gains.items():
        assert g > 1.0, (N, g)
    return gains


if __name__ == "__main__":
    main()
