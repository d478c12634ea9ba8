"""Single-run variance estimates: genealogy-based (Chan & Lai / Lee &
Whiteley) and lag-based (Olsson & Douc) estimators vs the empirical
variance over independent runs.

Counterpart of the reference's variance_estimation notebook experiments.
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
from particles_tpu import variance_estimators as var_est


def main(small=False):
    T = 15 if small else 30
    N, nruns = (200, 15) if small else (500, 50)
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
    x, y = ssm.simulate(jax.random.key(0), T)
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    single_run_ests, logLts, mean_ests = [], [], []
    for s in range(nruns):
        pf = particles.SMC(
            fk=fk, N=N, key=jax.random.key(s),
            collect=[var_est.Var_logLt(), var_est.Var()],
        )
        pf.run()
        single_run_ests.append(float(pf.summaries.var_logLt[-1]))
        logLts.append(float(pf.logLt))
        W = np.asarray(pf.wgts.W)
        mean_ests.append(float(np.sum(W * np.asarray(pf.X))))

    emp = np.var(logLts)
    est = np.mean(single_run_ests)
    print(f"var(logLt):   empirical over {nruns} runs = {emp:.5f}")
    print(f"              mean single-run estimate    = {est:.5f}")
    print(f"filter mean:  empirical var  = {np.var(mean_ests):.6f}")
    # the genealogy estimator tracks the true estimator variance
    # (order-of-magnitude agreement is the estimator's guarantee here)
    assert est > 0
    assert 0.2 < est / max(emp, 1e-8) < 5.0, (est, emp)
    return {"empirical": emp, "single_run": est}


if __name__ == "__main__":
    main()
