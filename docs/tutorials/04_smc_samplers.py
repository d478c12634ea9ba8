"""SMC samplers: IBIS and (adaptive) tempering for static targets.

Mirrors ``SMC_samplers_tutorial.ipynb``: define a static Bayesian model
(`StaticModel` with a `logpyt`), then estimate it two ways — IBIS
(sequential in the data) and adaptive tempering (sequential in an
exponent).  Both run waste-free MCMC moves by default (Dau & Chopin
2022).  The example is a conjugate Gaussian-mean model so the exact
posterior and evidence are available.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp

SIG = 1.0        # known observation sd
TAU = 3.0        # prior sd of the mean


class GaussMean(ssp.StaticModel):
    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=SIG).logpdf(self.data[t])


def exact_posterior(data):
    n = len(data)
    prec = 1 / TAU**2 + n / SIG**2
    return float(np.sum(data) / SIG**2 / prec), float(1 / np.sqrt(prec))


def exact_log_evidence(data):
    n = len(data)
    cov = SIG**2 * np.eye(n) + TAU**2 * np.ones((n, n))
    _, logdet = np.linalg.slogdet(cov)
    return float(-0.5 * n * np.log(2 * np.pi) - 0.5 * logdet
                 - 0.5 * data @ np.linalg.solve(cov, data))


def main(small=False):
    n = 30 if small else 100
    N = 100 if small else 400
    rng = np.random.default_rng(0)
    data = rng.normal(size=n) * SIG + 0.7
    prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=TAU)})
    model = GaussMean(data=data, prior=prior)
    mu_post, sd_post = exact_posterior(data)
    logZ = exact_log_evidence(data)

    # (a) IBIS: one SMC step per observation; logLt = log evidence
    alg = particles.SMC(fk=ssp.IBIS(model=model, len_chain=10), N=N,
                        key=jax.random.key(1))
    alg.run()
    W = np.asarray(alg.wgts.W)
    mu = np.asarray(alg.X.theta["mu"])
    est = float((W * mu).sum())
    print(f"IBIS     : E[mu|y] {est:+.3f} (exact {mu_post:+.3f}), "
          f"log Z {float(alg.logLt):.2f} (exact {logZ:.2f})")
    assert abs(est - mu_post) < 4 * sd_post
    assert abs(float(alg.logLt) - logZ) < 1.0

    # (b) adaptive tempering: exponents chosen on the fly to keep
    # ESS = alpha * N; done when the exponent reaches 1
    alg2 = particles.SMC(
        fk=ssp.AdaptiveTempering(model=model, len_chain=10), N=N,
        key=jax.random.key(2))
    alg2.run()
    W2 = np.asarray(alg2.wgts.W)
    mu2 = np.asarray(alg2.X.theta["mu"])
    est2 = float((W2 * mu2).sum())
    print(f"Tempering: E[mu|y] {est2:+.3f}, log Z {float(alg2.logLt):.2f} "
          f"in {alg2.t} stages")
    assert abs(est2 - mu_post) < 4 * sd_post
    assert abs(float(alg2.logLt) - logZ) < 1.5
    return {"ibis": est, "tempering": est2}


if __name__ == "__main__":
    main()
