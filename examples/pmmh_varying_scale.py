"""PMMH mixing as a function of the random-walk proposal scale.

TPU-native counterpart of book/pmcmc/pmmh_lingauss_varying_scale.py
(Figure 16.3; the reference quotes ~5 h of CPU time): non-adaptive PMMH
chains on a linear-Gaussian model, run over a grid of proposal scales.
Too small a scale gives high acceptance but tiny moves; too large gives
rejections; mean squared jumping distance (MSJD) peaks in between.

Each chain's whole trajectory is one compiled chunked scan, so the whole
scale study runs in seconds instead of hours.
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
    """rho is the only free parameter (sigmas fixed at the truth)."""

    default_params = {"sigmaY": 0.2, "rho": 0.9, "sigmaX": 1.0,
                      "sigma0": None}


def main(small=False):
    T = 25 if small else 100
    niter = 150 if small else 1500
    Nx = 50 if small else 100
    scales = (0.05, 0.4) if small else (0.02, 0.1, 0.4, 1.5)
    true = LGfixed(rho=0.8)
    x, y = true.simulate(jax.random.key(0), T)
    prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})

    msjd, acc = {}, {}
    for s in scales:
        m = mcmc.PMMH(ssm_cls=LGfixed, prior=prior, data=y, Nx=Nx,
                      niter=niter, adaptive=False, scale=s,
                      key=jax.random.key(int(s * 1000)))
        m.run()
        chain = np.asarray(m.chain.theta["rho"])
        assert np.isfinite(chain).all()
        msjd[s] = float(np.sum(np.diff(chain) ** 2))
        acc[s] = float(m.acc_rate)
        print(f"scale={s:5.2f}: acceptance {acc[s]:5.1%}  MSJD {msjd[s]:8.3f}")

    # acceptance decreases with scale (the Metropolis trade-off)
    assert acc[scales[0]] > acc[scales[-1]], acc
    if not small:
        # MSJD is maximised at an interior scale (Figure 16.3's point)
        best = max(msjd, key=msjd.get)
        assert best not in (scales[0], scales[-1]), msjd
    return msjd, acc


if __name__ == "__main__":
    main()
