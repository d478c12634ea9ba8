"""Hurzeler & Kunsch's CRN likelihood-evaluation method (book Fig 14.5).

TPU-native counterpart of book/mle/hurzeler_kunsch.py: draw M smoothed
trajectories (FFBS) once at a base parameter theta0, then evaluate the
log-likelihood over a whole grid of sigmas by importance-reweighting the
SAME trajectories (common random numbers) — the ESS of the reweighting
tells you over what range of sigma the CRN estimate is trustworthy.

TPU design: the log-joint density over the (sigma-grid x M-trajectories)
plane is one vmapped vectorised reduction — the entire 401-point grid of
the reference's Python loop is a single device program.

Asserted outcomes (the figure's content): the ESS is ~M at sigma0 for
every T, decays away from sigma0, and the usable sigma-window SHRINKS as
T grows (the reference's reason for plotting T=10/100/1000).
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
from particles_tpu import datasets
from particles_tpu import resampling as rs
from particles_tpu import state_space_models as ssms

MU0, RHO0, SIGMA0 = -1.0, 0.9, 0.3


def log_joint(sigma, trajs, data):
    """log p_theta(x_{0:T-1}, y_{0:T-1}) for theta=(MU0, RHO0, sigma),
    vectorised over the M trajectories; trajs is (T, M)."""
    mod = ssms.StochVol(mu=MU0, rho=RHO0, sigma=sigma)
    lj = mod.PX0().logpdf(trajs[0]) + mod.PY(0, None, trajs[0]).logpdf(data[0])
    # transitions + observations, all t >= 1 at once: (T-1, M) planes
    lx = (
        dists_norm_logpdf(trajs[1:], mod.EXt(trajs[:-1]), sigma)
        .sum(axis=0)
    )
    ly = dists_norm_logpdf(
        data[1:, None], 0.0, jnp.exp(0.5 * trajs[1:])
    ).sum(axis=0)
    return lj + lx + ly


def dists_norm_logpdf(x, loc, scale):
    z = (x - loc) / scale
    return -0.5 * z**2 - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi)


def main(small=False):
    data = jnp.asarray(datasets.GBP_vs_USD_9798().data, jnp.float32)
    Ts = (10, 50) if small else (10, 100, 1000)
    N = 64 if small else 100
    M = 64 if small else 100
    ngrid = 41 if small else 401
    sigmas = jnp.linspace(SIGMA0 - 0.199, SIGMA0 + 0.2, ngrid)
    i0 = int(jnp.argmin(jnp.abs(sigmas - SIGMA0)))

    ess_curves = {}
    for T in Ts:
        fk = ssms.Bootstrap(
            ssm=ssms.StochVol(mu=MU0, rho=RHO0, sigma=SIGMA0),
            data=data[:T],
        )
        pf = particles.SMC(fk=fk, N=N, store_history=True,
                           key=jax.random.key(T))
        pf.run()
        trajs = pf.hist.backward_sampling_ON2(jax.random.key(T + 1), M)
        trajs = jnp.asarray(trajs)  # (T, M)

        @jax.jit
        def ess_of_sigma(sig, trajs=trajs, T=T):
            ll0 = log_joint(jnp.float32(SIGMA0), trajs, data[:T])
            ll = log_joint(sig, trajs, data[:T])
            return rs.essl(ll - ll0)

        ess = np.asarray(jax.vmap(ess_of_sigma)(sigmas))
        ess_curves[T] = ess
        print(f"T={T:5d}: ESS at sigma0 = {ess[i0]:6.1f} / {M}, "
              f"min over grid = {ess.min():6.1f}")

    for T, ess in ess_curves.items():
        assert ess[i0] > 0.98 * M, (T, ess[i0])  # CRN exact at theta0
        assert np.isfinite(ess).all()
    # the usable window shrinks with T: compare ESS at a fixed offset
    joff = min(i0 + (5 if small else 40), ngrid - 1)
    es = [ess_curves[T][joff] for T in Ts]
    assert es[-1] < es[0], es
    return ess_curves


if __name__ == "__main__":
    main()
