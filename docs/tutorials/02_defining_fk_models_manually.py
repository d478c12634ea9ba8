"""Defining Feynman-Kac models manually.

Mirrors ``Defining_Feynman-Kac_models_manually.ipynb``: the SMC engine
runs *any* object implementing the Feynman-Kac protocol (`M0`, `M`,
`logG`, horizon `T`), not just state-space-model adapters.  Here we build
a Gaussian sequential importance sampler by hand: target N(mu, 1) after
tempering through N(0, 1), moving particles with an autoregressive
kernel.

The exact normalising constant of each bridge is available in closed
form, so the example doubles as a correctness check of the engine's
logLt accounting for hand-written models.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import core


class GaussianBridge(core.FeynmanKac):
    """Move N(0,1) -> N(mu,1) through T geometric-bridge potentials.

    G_t(x) = exp(lambda_t * (mu*x - mu^2/2)) with lambda_t = 1/T, so that
    the product of the normalised potentials telescopes and
    log L_T = 0 analytically (each increment has known mean under the
    current law) -- a hand-computable target for the engine.
    """

    def __init__(self, mu=1.0, T=10):
        self.mu = mu
        self.T = T
        self.du = 1

    def M0(self, key, N):
        return jax.random.normal(key, (N,))

    def M(self, key, t, xp):
        # AR(1) MCMC-flavoured move that leaves N(lam*mu, 1) approximately
        # invariant along the bridge; correctness of logLt does not depend
        # on this choice (importance weights correct for it).
        rho = 0.9
        lam = t / self.T
        mean = lam * self.mu + rho * (xp - lam * self.mu)
        return mean + jnp.sqrt(1 - rho**2) * jax.random.normal(key, xp.shape)

    def logG(self, t, xp, x):
        # geometric-bridge increment between N(0,1) and N(mu,1): after
        # step t the cumulative exponent is (t+1)/T, reaching 1 at t=T-1
        dlam = 1.0 / self.T
        return dlam * (self.mu * x - 0.5 * self.mu**2)


def main(small=False):
    T, N = (5, 2000) if small else (10, 20000)
    mu = 1.0
    fk = GaussianBridge(mu=mu, T=T)
    pf = particles.SMC(fk=fk, N=N, key=jax.random.key(2))
    pf.run()

    # Exact log of the normalising constant of the final target
    # integral of N(x;0,1) * exp(mu x - mu^2/2) dx = 1  =>  log L_T -> 0
    # (for the full geometric bridge the telescoped constant is also 0 up
    # to O(dlam^2) move-mixing error).
    ll = float(pf.logLt)
    print(f"log L_T = {ll:+.3f} (exact 0, MC + bridge-discretisation error)")
    assert abs(ll) < 0.1, ll

    # final particles target N(mu, 1) (approximately; weighted)
    W = np.asarray(pf.wgts.W)
    xs = np.asarray(pf.X)
    post_mean = float((W * xs).sum())
    print(f"weighted mean   = {post_mean:+.3f} (target {mu})")
    assert abs(post_mean - mu) < 0.25
    return pf


if __name__ == "__main__":
    main()
