"""Compare off-line smoothing algorithms (FFBS variants, two-filter) on a
linear-Gaussian model against the exact Kalman smoother.

TPU-native counterpart of book/smoothing/offline_smoothing.py (which the
reference quotes at ~1 day of CPU time for the full study).
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np

import jax

from particles_tpu import kalman
from particles_tpu import smoothing
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 20 if small else 50
    N = 200 if small else 500
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
    x, y = ssm.simulate(jax.random.key(7), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.smoother()
    exact = np.asarray(kf.smth.mean)[:, 0]

    fk = ssms.Bootstrap(ssm=ssm, data=y)
    add_func = lambda t, xp, xc: xp
    log_gamma = lambda xx: ssm.PX0().logpdf(xx)

    errs = {}
    methods = (("FFBS_MCMC", "FFBS_hybrid") if small else
               ("FFBS_ON2", "FFBS_MCMC", "FFBS_hybrid",
                "two-filter_ON2", "two-filter_ON"))
    for method in methods:
        out = smoothing.smoothing_worker(
            method=method, N=N, fk=fk, add_func=add_func,
            log_gamma=log_gamma, key=jax.random.key(3),
        )
        err = np.abs(np.asarray(out["est"]) - exact[:-1]).mean()
        errs[method] = err
        print(f"{method:16s}: mean abs err {err:.4f}  ({out['cpu']:.2f}s)")
    # every smoother tracks the exact Kalman smoothing means
    tol = 0.35 if small else 0.2
    for method, err in errs.items():
        assert err < tol, (method, err)
    return errs


if __name__ == "__main__":
    main()
