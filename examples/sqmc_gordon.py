"""SMC vs SQMC on the Gordon et al. (1993) toy nonlinear model.

TPU-native counterpart of book/sqmc/sqmc_gordon.py (Chapter 13, Figure
13.4): the classic bimodal benchmark — quadratic observation of a
nonlinear AR state — where SQMC's Hilbert-ordered stratification still
pays despite the multimodal filter distributions.  Asserts the SQMC
variance gain on logLt and on the filtering means across replicates.
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
from particles_tpu import collectors as col
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 30 if small else 100
    N = 128 if small else 512
    nreps = 6 if small else 16
    model = ssms.Gordon_etal()
    x, y = model.simulate(jax.random.key(0), T)
    fk = ssms.Bootstrap(ssm=model, data=y)

    res = {}
    for qmc in (False, True):
        lls, means = [], []
        for s in range(nreps):
            pf = particles.SMC(fk=fk, N=N, qmc=qmc,
                               collect=[col.Moments()],
                               key=jax.random.key(300 * qmc + s))
            pf.run()
            lls.append(float(pf.logLt))
            means.append(np.asarray(pf.summaries.moments["mean"]))
        res[qmc] = (np.var(lls), np.stack(means).var(axis=0).mean())
        name = "SQMC" if qmc else "SMC "
        print(f"{name}: var(logLt) {res[qmc][0]:.4f}   "
              f"mean per-t var of filter means {res[qmc][1]:.4f}")
    gain_ll = res[False][0] / max(res[True][0], 1e-12)
    gain_mean = res[False][1] / max(res[True][1], 1e-12)
    print(f"SQMC gains: logLt {gain_ll:.1f}x, filtering means "
          f"{gain_mean:.1f}x")
    # SQMC dominates on this classic despite bimodality
    assert gain_ll > 1.0, gain_ll
    assert gain_mean > 1.0, gain_mean
    return res


if __name__ == "__main__":
    main()
