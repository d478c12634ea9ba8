"""2-D log-likelihood contours for stochastic volatility, one vmapped
device program for the whole grid.

TPU-native counterpart of book/mle/contour_loglik_stochvol.py (and the
ecological variant): the bootstrap log-likelihood estimate is evaluated
on a (rho, sigma) grid with common random numbers — models are pytrees,
so the G^2 filters run as a single vmapped scan.  Asserts the surface
peaks near the true parameters and is smooth (CRN).
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

from particles_tpu import core
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 60 if small else 200
    N = 150 if small else 600
    G = 7 if small else 15
    true = ssms.StochVol(mu=-1.0, rho=0.9, sigma=0.3)
    x, y = true.simulate(jax.random.key(0), T)

    rhos = jnp.linspace(0.6, 0.98, G)
    sigmas = jnp.linspace(0.1, 0.8, G)
    rr, ss = jnp.meshgrid(rhos, sigmas, indexing="ij")

    def loglik(rho, sigma, key):
        fk = ssms.Bootstrap(
            ssm=ssms.StochVol(mu=-1.0, rho=rho, sigma=sigma), data=y)
        carry, _, _ = core._run_full(fk, key, N, T, False, "systematic",
                                     0.5, None, False)
        return carry.logLt

    surf = jax.jit(jax.vmap(loglik, in_axes=(0, 0, None)))(
        rr.ravel(), ss.ravel(), jax.random.key(7))
    surf = np.asarray(surf).reshape(G, G)

    i, j = np.unravel_index(surf.argmax(), surf.shape)
    rho_hat, sig_hat = float(rhos[i]), float(sigmas[j])
    print(f"grid argmax: rho={rho_hat:.3f} sigma={sig_hat:.3f} "
          f"(true 0.9 / 0.3); {G * G} filters in one device program")
    # the simulated-likelihood surface peaks near the truth
    assert abs(rho_hat - 0.9) < 0.25
    assert abs(sig_hat - 0.3) < 0.3
    # and the true-parameter cell is within a few units of the max
    it = int(np.argmin(np.abs(np.asarray(rhos) - 0.9)))
    jt = int(np.argmin(np.abs(np.asarray(sigmas) - 0.3)))
    assert surf[it, jt] > surf.max() - 8.0, (surf[it, jt], surf.max())
    return surf


if __name__ == "__main__":
    main()
