"""MCMC smoothing samplers for stochastic volatility, against a QMC-FFBS
gold standard (Chapter 15's closing numerical example).

TPU-native counterpart of book/mcmc/compare_mcmc_samplers_stochvol.py:
the target is the smoothing distribution of a basic StochVol model on
the real GBP/USD 97-98 log-returns.  QMC-FFBS gives the gold-standard
smoothing mean; a conditional-SMC (Particle Gibbs state-update) chain
must reproduce it.
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
from particles_tpu import datasets as dts
from particles_tpu import mcmc
from particles_tpu import state_space_models as ssms


def main(small=False):
    T = 50 if small else 200
    N = 256 if small else 1024
    niter = 10 if small else 40
    data = np.asarray(dts.GBP_vs_USD_9798().data)[:T]
    ssm = ssms.StochVol(mu=-1.02, sigma=0.178, rho=0.9702)

    # gold standard: QMC filter + QMC-FFBS smoothing trajectories
    fk = ssms.Bootstrap(ssm=ssm, data=data)
    pf = particles.SMC(fk=fk, N=N, qmc=True, store_history=True,
                       key=jax.random.key(1))
    pf.run()
    paths = pf.hist.backward_sampling_qmc(jax.random.key(2), N // 2)
    gold = np.asarray(paths).mean(axis=1)

    # CSMC chain: iterate conditional SMC, extracting one trajectory per
    # sweep (the state-update half of Particle Gibbs)
    key = jax.random.key(3)
    traj = None
    kept = []
    for i in range(niter):
        key, k1, k2 = jax.random.split(key, 3)
        if traj is None:
            cpf = particles.SMC(fk=fk, N=N, store_history=True, key=k1)
        else:
            cpf = mcmc.CSMC(fk=fk, N=N, xstar=traj, key=k1)
        cpf.run()
        traj = cpf.hist.extract_one_trajectory(k2)
        if i >= niter // 3:
            kept.append(np.asarray(traj))
    csmc_mean = np.stack(kept).mean(axis=0)

    err = np.abs(csmc_mean - gold).mean()
    sd = np.stack(kept).std(axis=0).mean()
    print(f"mean |CSMC - QMC-FFBS| over t: {err:.3f} "
          f"(posterior sd ~ {sd:.3f})")
    # the CSMC chain targets the same smoothing distribution
    assert err < 4 * sd + 0.15, (err, sd)
    return {"gold": gold, "csmc": csmc_mean}


if __name__ == "__main__":
    main()
