"""Variability of the particle log-likelihood estimate vs the exact
Kalman log-likelihood, as N grows.

TPU-native counterpart of book/mle/variability_loglik_estimates.py (which
the reference warns "takes 2 days and a half to complete without
multi-processing"): the replicates run as one vmapped compiled program via
``multiSMC``.  Asserts the two textbook facts the figure illustrates: the
estimate is (nearly) unbiased in the natural scale, and the variance of
log L_t shrinks like 1/N.
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
    T = 30 if small else 100
    Ns = (50, 200) if small else (100, 400, 1600)
    nruns = 20 if small else 50
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(4), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    exact = float(kf.logLt)

    variances = {}
    for i, N in enumerate(Ns):
        runs = particles.multiSMC(
            fk=ssms.Bootstrap(ssm=ssm, data=y), N=N, nruns=nruns,
            key=jax.random.key(100 + i),
        )
        lls = np.array([float(r["output"].logLt) for r in runs])
        variances[N] = lls.var()
        print(f"N={N:5d}: logLt mean {lls.mean():9.3f}  sd {lls.std():.3f}  "
              f"bias {lls.mean() - exact:+.3f}   (exact {exact:.3f})")
        # CLT-scale check: bias of the log is O(var); allow 4 sd of the mean
        assert abs(lls.mean() - exact) < max(
            4 * lls.std() / np.sqrt(nruns) + lls.var(), 0.5
        ), (N, lls.mean(), exact)
    # variance of logLt decreases with N (roughly 1/N)
    vs = [variances[N] for N in Ns]
    assert vs[-1] < vs[0], variances
    return variances


if __name__ == "__main__":
    main()
