"""Evidence estimation: vanilla nested sampling vs NS-SMC vs adaptive
tempering, on a conjugate Gaussian model with known evidence."""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np
import scipy.stats as st

import jax

import particles_tpu as particles
from particles_tpu import distributions as dists
from particles_tpu import nested
from particles_tpu import smc_samplers as ssp


class GaussianMean(ssp.StaticModel):
    def logpyt(self, theta, t):
        return dists.Normal(loc=theta["mu"], scale=1.0).logpdf(self.data[t])


def main(small=False):
    rng = np.random.default_rng(1)
    T = 20
    N_ns, N_smc = (100, 150) if small else (200, 300)
    y = rng.normal(loc=1.0, size=T).astype(np.float32)
    prior = dists.StructDist({"mu": dists.Normal(loc=0.0, scale=1.0)})
    model = GaussianMean(data=y, prior=prior)
    exact = st.multivariate_normal(
        np.zeros(T), np.eye(T) + np.ones((T, T))
    ).logpdf(y)
    print(f"exact log-evidence: {exact:.3f}\n")

    ns = nested.Nested_RWmoves(model=model, N=N_ns, nsteps=5,
                               key=jax.random.key(0))
    ns.run()
    ns_est = float(ns.lZhats[-1])
    print(f"vanilla NS          : {ns_est:8.3f} "
          f"({len(ns.lZhats)} contractions)")

    pf = particles.SMC(
        fk=nested.NestedSamplingSMC(model=model, len_chain=5, ESSrmin=0.3),
        N=N_smc, key=jax.random.key(1),
    )
    pf.run()
    nssmc_est = float(pf.X.shared["log_evid"])
    print(f"NS-SMC              : {nssmc_est:8.3f} "
          f"({pf.t} levels)")

    pf2 = particles.SMC(
        fk=ssp.AdaptiveTempering(model=model, len_chain=5), N=N_smc,
        key=jax.random.key(2),
    )
    pf2.run()
    temp_est = float(pf2.logLt)
    print(f"adaptive tempering  : {temp_est:8.3f} "
          f"({pf2.t} tempering steps)")
    # all three estimators agree with the conjugate closed form
    for name, est, tol in (("NS", ns_est, 1.5), ("NS-SMC", nssmc_est, 1.5),
                           ("tempering", temp_est, 1.0)):
        assert abs(est - exact) < tol, (name, est, exact)
    return {"exact": exact, "ns": ns_est, "ns_smc": nssmc_est,
            "tempering": temp_est}


if __name__ == "__main__":
    main()
