"""Single-run variance estimation.

Mirrors ``variance_estimation.ipynb``: SMC output is random, and its
variance can be estimated *from a single run* using genealogy-based
estimators (Chan & Lai 2013; Lee & Whiteley 2018) attached as
collectors, or their lag-based variant (Olsson & Douc 2019) when the
genealogy degenerates.  The estimates are validated against the
empirical variance over independent runs.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax

import particles_tpu as particles
from particles_tpu import collectors as col
from particles_tpu import kalman
from particles_tpu import state_space_models as ssms
from particles_tpu import variance_estimators as var


def main(small=False):
    T = 20 if small else 50
    N = 300 if small else 1000
    nruns = 10 if small else 40
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.5)
    x, y = ssm.simulate(jax.random.key(0), T)
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    # one run with variance collectors attached
    pf = particles.SMC(
        fk=fk, N=N, key=jax.random.key(1),
        collect=[col.Moments(), var.Var(), var.Var_logLt(),
                 var.Lag_based_var(lag=3 if small else 5)],
    )
    pf.run()
    v_logLt = float(np.asarray(pf.summaries.var_logLt)[-1])
    print(f"single-run est  var[logLt] ~= {v_logLt:.4f}")

    # ground truth: empirical variance over independent runs
    runs = particles.multiSMC(fk=fk, N=N, nruns=nruns,
                              key=jax.random.key(7))
    lls = np.array([float(r["output"].logLt) for r in runs])
    emp = lls.var()
    print(f"empirical       var[logLt]  = {emp:.4f} over {nruns} runs")

    # same order of magnitude (both are noisy estimates)
    assert v_logLt > 0
    assert 0.1 < v_logLt / emp < 10, (v_logLt, emp)

    vs = np.asarray(pf.summaries.var)
    lag = np.asarray(pf.summaries.lag_based_var)
    assert vs.shape[0] == T and np.isfinite(vs).all()
    assert np.isfinite(lag).all()
    return {"single_run": v_logLt, "empirical": emp}


if __name__ == "__main__":
    main()
