"""Compare bootstrap / guided / auxiliary particle filters on a
linear-Gaussian model against the exact Kalman filter.

TPU-native counterpart of the reference experiment
book/filtering/comparing_bootstrap_guided_apf_lingauss.py.
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


def main():
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(0), 100)

    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    print(f"exact logLt (Kalman): {float(kf.logLt):.3f}")

    results = particles.multiSMC(
        fk={
            "bootstrap": ssms.Bootstrap(ssm=ssm, data=y),
            "guided": ssms.GuidedPF(ssm=ssm, data=y),
            "apf": ssms.AuxiliaryPF(ssm=ssm, data=y),
        },
        N=1000,
        nruns=20,
        key=jax.random.key(1),
    )
    for name in ("bootstrap", "guided", "apf"):
        lls = [float(r["output"].logLt) for r in results if r["fk"] == name]
        print(
            f"{name:10s}: logLt = {np.mean(lls):8.3f} "
            f"(bias {np.mean(lls) - float(kf.logLt):+.3f}, sd {np.std(lls):.3f})"
        )


if __name__ == "__main__":
    main()
