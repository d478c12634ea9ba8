"""PMMH posterior quality on a linear-Gaussian model vs the exact posterior.

TPU-native counterpart of book/pmcmc/pmmh_lingauss.py (the reference
quotes > 10 h of CPU time for 10^5-iteration chains) and of
pmmh_biased_lingauss.py's point that an inadequate inner filter gives a
noisier, stickier chain while PMMH remains *exactly* invariant for the
true posterior at ANY Nx (the pseudo-marginal property).

Oracle: the model is linear-Gaussian, so the exact posterior of rho is
computable by Kalman-filter grid quadrature.  We run adaptive PMMH at a
small and a moderate Nx and check both chains recover the exact posterior
mean (the small-Nx chain just mixes worse), the book's Figure 16.1/16.2
conclusion.
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


class LGfixed(kalman.LinearGauss):
    default_params = {"sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0,
                      "sigma0": None}


def main(small=False):
    T = 25 if small else 80
    niter = 300 if small else 4000
    burn = niter // 4
    true = LGfixed(rho=0.8)
    x, y = true.simulate(jax.random.key(0), T)
    prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})

    # exact posterior over rho by Kalman grid quadrature
    grid = np.linspace(-0.985, 0.985, 60 if small else 150)
    lls = np.array([
        float(kalman.Kalman(ssm=LGfixed(rho=float(r)), data=y).logLt)
        for r in grid
    ])
    post = np.exp(lls - lls.max())
    post /= post.sum()
    post_mean = float(np.sum(post * grid))
    post_sd = float(np.sqrt(np.sum(post * grid**2) - post_mean**2))
    print(f"exact posterior: E[rho]={post_mean:+.3f} sd={post_sd:.3f}")

    means, accs = {}, {}
    for Nx in ((20, 100) if small else (20, 200)):
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=Nx,
                      niter=niter, key=jax.random.key(Nx))
        m.run()
        chain = np.asarray(m.chain.theta["rho"])[burn:]
        means[Nx] = float(chain.mean())
        accs[Nx] = float(m.acc_rate)
        print(f"Nx={Nx:4d}: E[rho]={means[Nx]:+.3f}  "
              f"acceptance {accs[Nx]:5.1%}")
        assert np.isfinite(chain).all()

    tol = 6.0 * post_sd / np.sqrt(niter / 20) if not small else 0.35
    for Nx, mn in means.items():
        # pseudo-marginal exactness: both chains target the TRUE posterior
        assert abs(mn - post_mean) < max(tol, 0.15), (Nx, mn, post_mean)

    # vmapped multi-chain PMMH (TPU extension; the reference runs its
    # multi-chain studies serially): K overdispersed-prior-start chains in
    # one program — every chain individually recovers the exact posterior
    # mean, the multi-chain analogue of the book's convergence check
    nc = 2 if small else 4
    Nx = 100 if small else 200
    m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=Nx,
                  niter=niter, nchains=nc, key=jax.random.key(99))
    m.run()
    ch = np.asarray(m.chain.theta["rho"])[burn:]          # (iters, nc)
    per_chain = ch.mean(axis=0)
    print(f"{nc} vmapped chains at Nx={Nx}: per-chain E[rho] = "
          + " ".join(f"{v:+.3f}" for v in per_chain)
          + f"  acc = {np.asarray(m.acc_rate).round(2)}")
    assert abs(ch.ravel().mean() - post_mean) < max(tol, 0.15)
    assert np.abs(per_chain - post_mean).max() < max(2.5 * tol, 0.35), (
        per_chain, post_mean)
    # multi-chain convergence diagnostics: all chains found the mode
    diag = m.diagnostics(discard_frac=0.25)
    print("  diagnostics:", {k: {"rhat": round(v["rhat"], 3),
                                 "ess": round(v["ess"], 1)}
                             for k, v in diag.items()})
    assert diag["rho"]["rhat"] < 1.2, diag
    assert diag["rho"]["ess"] > 20, diag
    return means, post_mean


if __name__ == "__main__":
    main()
