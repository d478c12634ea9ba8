"""SMC vs SQMC for maximum-likelihood estimation (Malik & Pitt setup).

TPU-native counterpart of book/mle/compare_smc_sqmc_malik_and_pitt.py
(Chapter 13; the reference quotes 2-3 h of CPU time): when the
log-likelihood surface theta -> log L_T(theta) is estimated by particle
filters, the MLE search needs the estimates to be LOW-VARIANCE pointwise.
The book's comparison: at equal N, SQMC's scrambled-Sobol + Hilbert-order
resampling reduces the variance of log L_T by an order of magnitude or
more vs plain SMC.

Here each (theta, replicate) filter is one compiled scan; the whole
study — two engines x a theta grid x R replicates — runs in seconds.
Asserted outcome: SQMC's across-replicate variance of log L_T is smaller
than SMC's at every grid point (and by >2x on median), the figure's
conclusion.
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
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 30 if small else 100
    N = 128 if small else 512
    R = 4 if small else 10
    rhos = (0.7, 0.9) if small else (0.5, 0.7, 0.8, 0.9, 0.95)
    true = ssms.StochVol(mu=-1.0, rho=0.9, sigma=0.3)
    x, y = true.simulate(jax.random.key(0), T)

    var_smc, var_sqmc = [], []
    for rho in rhos:
        ssm = ssms.StochVol(mu=-1.0, rho=rho, sigma=0.3)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        lls = {True: [], False: []}
        for qmc in (False, True):
            for r in range(R):
                pf = particles.SMC(fk=fk, N=N, qmc=qmc,
                                   key=jax.random.key(17 * r + (1 if qmc
                                                                else 0)),
                                   collect="off")
                pf.run()
                lls[qmc].append(float(pf.logLt))
        v_s, v_q = np.var(lls[False]), np.var(lls[True])
        var_smc.append(v_s)
        var_sqmc.append(v_q)
        print(f"rho={rho:4.2f}: mean logLt {np.mean(lls[False]):8.2f}  "
              f"var SMC {v_s:8.4f}  var SQMC {v_q:8.4f}  "
              f"gain {v_s / max(v_q, 1e-12):6.1f}x")
        assert np.isfinite(lls[False]).all() and np.isfinite(lls[True]).all()

    gains = np.asarray(var_smc) / np.maximum(np.asarray(var_sqmc), 1e-12)
    # SQMC dominates for MLE purposes (the book's conclusion)
    assert np.median(gains) > 2.0, gains
    if not small:
        assert np.all(gains > 1.0), gains
    return gains


if __name__ == "__main__":
    main()
