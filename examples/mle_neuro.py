"""MLE for the neural-spike model of Temereanca et al. (2008) on the
real Neuro dataset.

TPU-native counterpart of book/mle/mle_neuro.py (Chapter 14, Figure
14.8): AR(1) latent state, Binomial(50, logit^-1(x)) spike counts.  The
reference runs EM and Nelder-Mead; here the CRN log-likelihood surface
is evaluated on a (rho, sigma2) grid as one vmapped device program and
checked against the published MLE (rho, sigma2) = (0.9981, 0.1089).
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
from particles_tpu import datasets as dts
from particles_tpu import distributions as dists
from particles_tpu import state_space_models as ssms


class NeuroSSM(ssms.StateSpaceModel):
    default_params = {"rho": 0.99, "sig2": 0.11}

    def PX0(self):
        return dists.Normal(loc=0.0, scale=jnp.sqrt(self.sig2))

    def PX(self, t, xp):
        return dists.Normal(loc=self.rho * xp, scale=jnp.sqrt(self.sig2))

    def PY(self, t, xp, x):
        return dists.Binomial(n=50, p=jax.nn.sigmoid(x))


def main(small=False):
    data = np.asarray(dts.Neuro().data, dtype=np.float32)
    T = len(data) if not small else 60
    N = 200 if small else 800
    y = jnp.asarray(data[:T])

    rhos = jnp.asarray([0.9, 0.97, 0.9981])
    sig2s = jnp.asarray([0.02, 0.1089, 0.5])
    rr, ss = jnp.meshgrid(rhos, sig2s, indexing="ij")

    def loglik(rho, sig2, key):
        fk = ssms.Bootstrap(ssm=NeuroSSM(rho=rho, sig2=sig2), data=y)
        carry, _, _ = core._run_full(fk, key, N, T, False, "systematic",
                                     0.5, None, False)
        return carry.logLt

    surf = np.asarray(jax.jit(jax.vmap(loglik, in_axes=(0, 0, None)))(
        rr.ravel(), ss.ravel(), jax.random.key(1))).reshape(3, 3)
    i, j = np.unravel_index(surf.argmax(), surf.shape)
    print("logLt grid (rows rho, cols sigma2):")
    for r in range(3):
        print("  " + "  ".join(f"{surf[r, c]:9.2f}" for c in range(3)))
    print(f"argmax at rho={float(rhos[i])}, sigma2={float(sig2s[j])} "
          f"(published MLE 0.9981, 0.1089)")
    if not small:
        # on the full series the published MLE cell dominates the grid
        assert (i, j) == (2, 1), (i, j, surf)
    assert np.isfinite(surf).all()
    return surf


if __name__ == "__main__":
    main()
