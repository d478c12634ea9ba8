"""2-D log-likelihood contours for the theta-logistic ecological model.

TPU-native counterpart of book/mle/contour_loglik_ecological.py: the
bootstrap log-likelihood estimate on a (tau0, tau1) grid of the Peters et
al. (2010) population model, with common random numbers so the surface is
smooth in theta.  Models are pytrees, so the whole G^2 grid of filters is
ONE vmapped compiled scan (the reference runs them filter by filter on
CPU).

Asserted outcomes: the CRN surface is finite everywhere, peaks in the
interior near the true (tau0, tau1), and the true parameter's
log-likelihood is within a few nats of the grid maximum.
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
    T = 30 if small else 100
    N = 150 if small else 600
    G = 6 if small else 13
    true = ssms.ThetaLogistic()
    x, y = true.simulate(jax.random.key(5), T)

    tau0s = jnp.linspace(0.03, 0.35, G)
    tau1s = jnp.linspace(0.03, 0.30, G)
    t0g, t1g = jnp.meshgrid(tau0s, tau1s, indexing="ij")

    def loglik(tau0, tau1, key):
        fk = ssms.Bootstrap(
            ssm=ssms.ThetaLogistic(tau0=tau0, tau1=tau1), data=y)
        carry, _, _ = core._run_full(fk, key, N, T, False, "systematic",
                                     0.5, None, False)
        return carry.logLt

    surf = jax.jit(jax.vmap(loglik, in_axes=(0, 0, None)))(
        t0g.ravel(), t1g.ravel(), jax.random.key(1)).reshape(G, G)
    surf = np.asarray(surf)
    assert np.isfinite(surf).all()

    imax = np.unravel_index(surf.argmax(), surf.shape)
    best = (float(tau0s[imax[0]]), float(tau1s[imax[1]]))
    print(f"grid argmax (tau0, tau1) = ({best[0]:.3f}, {best[1]:.3f}) "
          f"(true ({true.tau0}, {true.tau1}))")
    # true parameter scores close to the grid max (CRN surface coherence)
    i0 = int(np.argmin(np.abs(np.asarray(tau0s) - true.tau0)))
    i1 = int(np.argmin(np.abs(np.asarray(tau1s) - true.tau1)))
    gap = surf.max() - surf[i0, i1]
    print(f"logLt(true) - max = {-gap:.2f} nats")
    assert gap < (20.0 if small else 10.0), gap
    if not small:
        # the maximiser is an interior point (a genuine peak, not an edge)
        assert 0 < imax[0] < G - 1 or 0 < imax[1] < G - 1, imax
    return surf


if __name__ == "__main__":
    main()
