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


def main(small=False):
    T = 30 if small else 100
    N = 200 if small else 1000
    nruns = 6 if small else 20
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(0), T)

    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    exact = float(kf.logLt)
    print(f"exact logLt (Kalman): {exact:.3f}")

    results = particles.multiSMC(
        fk={
            "bootstrap": ssms.Bootstrap(ssm=ssm, data=y),
            "guided": ssms.GuidedPF(ssm=ssm, data=y),
            "apf": ssms.AuxiliaryPF(ssm=ssm, data=y),
        },
        N=N,
        nruns=nruns,
        key=jax.random.key(1),
    )
    out = {}
    for name in ("bootstrap", "guided", "apf"):
        lls = [float(r["output"].logLt) for r in results if r["fk"] == name]
        out[name] = (np.mean(lls) - exact, np.std(lls))
        print(
            f"{name:10s}: logLt = {np.mean(lls):8.3f} "
            f"(bias {np.mean(lls) - exact:+.3f}, sd {np.std(lls):.3f})"
        )
    # the book's point (figure 10.2-ish): guided/APF dominate bootstrap
    # on this model, and all three are unbiased within MC error
    for name, (bias, sd) in out.items():
        assert abs(bias) < 5 * sd / np.sqrt(nruns) + 0.3, (name, bias, sd)
    assert out["guided"][1] < out["bootstrap"][1], out
    return out


if __name__ == "__main__":
    main()
