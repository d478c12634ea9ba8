"""Effect of the resampling schedule (ESSrmin) and scheme on filter quality.

TPU-native counterpart of book/filtering/adaptive_resampling.py (quoted at
~30 min single-core) and book/resampling/compare_* — here a single
multiSMC call over the full cartesian grid, batched on device.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np

import jax

import particles_tpu as particles
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 30 if small else 100
    N = 100 if small else 1000
    nruns = 6 if small else 30
    essrmins = [0.5] if small else [0.0, 0.25, 0.5, 0.75, 1.0]
    schemes = (["systematic", "multinomial"] if small
               else ["multinomial", "systematic", "ssp"])
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(0), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    exact = float(kf.logLt)
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    results = particles.multiSMC(
        fk=fk, N=N, nruns=nruns,
        ESSrmin=essrmins,
        resampling=schemes,
        key=jax.random.key(1),
    )
    print(f"exact logLt = {exact:.3f}\n")
    print(f"{'ESSrmin':>8} {'scheme':>12} {'bias':>8} {'std':>7}")
    out = {}
    for essrmin in essrmins:
        for scheme in schemes:
            lls = [float(r["output"].logLt) for r in results
                   if r["ESSrmin"] == essrmin and r["resampling"] == scheme]
            out[(essrmin, scheme)] = (np.mean(lls) - exact, np.std(lls))
            print(f"{essrmin:8.2f} {scheme:>12} "
                  f"{np.mean(lls) - exact:+8.3f} {np.std(lls):7.3f}")
    # The chapter's finding: any schedule that actually resamples gives a
    # near-unbiased logLt, while NEVER resampling (ESSrmin=0) collapses to
    # pure importance sampling whose log-estimate degenerates with T (at
    # T=100, sigmaY=0.2 the measured bias is ~-4000 nats) — resampling is
    # what keeps the particle approximation alive.
    tol = 6.0 / np.sqrt(N * nruns / 100)
    for (essrmin, scheme), (bias, sd) in out.items():
        if essrmin == 0.0 and T >= 100:
            assert bias < -10.0, (essrmin, scheme, bias, sd)
        else:
            assert abs(bias) < max(tol, 4 * sd / np.sqrt(nruns) + 0.2), (
                essrmin, scheme, bias, sd)
    return out


if __name__ == "__main__":
    main()
