"""Log-likelihood surface evaluation with common random numbers (CRN),
vmapped over a parameter grid.

TPU-native counterpart of the MLE-chapter scripts
(book/mle/hurzeler_kunsch.py — Hürzeler & Künsch's CRN trick, Fig 14.5 —
and the contour_loglik_* scripts): because models are pytrees, ONE
compiled filter is vmapped over a whole grid of parameter values, and
passing the same PRNG key to every grid point gives common random
numbers — the estimated surface is smooth in theta, so its argmax is a
sensible simulated MLE.  The reference evaluates the grid filter by
filter on CPU; here the entire surface is one device program.
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

from particles_tpu import core, kalman
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 50 if small else 100
    N = 400 if small else 1000
    G = 9 if small else 21
    true_rho = 0.8
    ssm0 = kalman.LinearGauss(rho=true_rho, sigmaX=1.0, sigmaY=0.5)
    x, y = ssm0.simulate(jax.random.key(0), T)

    rhos = jnp.linspace(0.5, 0.95, G)

    def loglik(rho, key):
        fk = ssms.Bootstrap(
            ssm=kalman.LinearGauss(rho=rho, sigmaX=1.0, sigmaY=0.5), data=y)
        carry, _, _ = core._run_full(fk, key, N, T, False, "systematic",
                                     0.5, None, False)
        return carry.logLt

    # CRN: the SAME key for every grid point -> smooth surface
    surface = jax.jit(jax.vmap(loglik, in_axes=(0, None)))(
        rhos, jax.random.key(7))
    surface = np.asarray(surface)

    # exact surface from the Kalman filter
    exact = np.array([_kalman_ll(float(r), y) for r in rhos])

    i_hat = int(surface.argmax())
    i_exact = int(exact.argmax())
    print(f"CRN surface argmax: rho = {float(rhos[i_hat]):.3f}   "
          f"exact argmax: rho = {float(rhos[i_exact]):.3f}   "
          f"(true {true_rho})")
    # the CRN surface has the exact surface's shape and peaks nearby
    assert np.corrcoef(surface, exact)[0, 1] > 0.9
    grid_step = float(rhos[1] - rhos[0])
    assert abs(float(rhos[i_hat]) - float(rhos[i_exact])) < 2.5 * grid_step
    # and tracks the exact values uniformly
    assert np.max(np.abs(surface - exact)) < 0.05 * abs(exact).max() + 3.0
    return {"rhos": np.asarray(rhos), "surface": surface, "exact": exact}


def _kalman_ll(rho, y):
    kf = kalman.Kalman(ssm=kalman.LinearGauss(rho=rho, sigmaX=1.0,
                                              sigmaY=0.5), data=y)
    kf.filter()
    return float(kf.logLt)


if __name__ == "__main__":
    main()
