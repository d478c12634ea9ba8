"""How many MCMC steps does MCMC-FFBS need?  (Answer: one.)

TPU-native counterpart of papers/complexity_smoothing/nr_mcmc_steps.py
(Dau & Chopin 2023): backward sampling via an MCMC kernel targeting the
backward distribution costs O(N) per step instead of O(N^2) / rejection;
the paper's finding is that a SINGLE Metropolis step per time already
matches the exact (O(N^2)) backward pass on the score-function smoothing
functional of a discrete Cox model.

TPU design: each (run, nsteps) cell is a compiled forward filter + a
compiled backward scan; the replicate axis is plain Python (each run is
milliseconds on device).

Asserted outcomes: for every nsteps in {1, 2, 10} the distribution of the
smoothing estimate matches the exact ON2 reference (mean within MC error,
spread within 2x) — i.e. nsteps=1 "works already well" (the script's own
bottom line).
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

import particles_tpu as particles
from particles_tpu import state_space_models as ssms

MU0, PHI0, SIGMA0 = 0.0, 0.9, 0.5


def score_addf(trajs):
    """sum_t psi_t(x_{t-1}, x_t): the score of the Cox model at theta0,
    averaged over the M sampled trajectories (reference :46-55)."""
    x = trajs
    psi0 = (-0.5 / SIGMA0**2
            + (0.5 * (1.0 - PHI0**2) / SIGMA0**4) * (x[0] - MU0) ** 2)
    incr = (-0.5 / SIGMA0**2 + (0.5 / SIGMA0**4)
            * ((x[1:] - MU0) - PHI0 * (x[:-1] - MU0)) ** 2)
    return float(jnp.mean(psi0 + incr.sum(axis=0)))


def main(small=False):
    T = 30 if small else 100
    N = 64 if small else 200
    nruns = 4 if small else 25
    ssm = ssms.DiscreteCox(mu=MU0, phi=PHI0, sigma=SIGMA0)
    _, y = ssm.simulate(jax.random.key(0), T)
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    # paper setting: multinomial resampling at every step (the regime the
    # MCMC-backward-kernel validity proof covers)
    ests = {ns: [] for ns in (1, 2, 10)}
    ests["ON2"] = []
    for s in range(nruns):
        pf = particles.SMC(fk=fk, N=N, resampling="multinomial",
                           ESSrmin=1.0, store_history=True,
                           key=jax.random.key(s + 1))
        pf.run()
        for ns in (1, 2, 10):
            z = pf.hist.backward_sampling_mcmc(
                jax.random.key(1000 * s + ns), N, nsteps=ns)
            ests[ns].append(score_addf(jnp.asarray(z)))
        z = pf.hist.backward_sampling_ON2(jax.random.key(7000 + s), N)
        ests["ON2"].append(score_addf(jnp.asarray(z)))

    ref = np.array(ests["ON2"])
    print(f"T={T} N={N} nruns={nruns}")
    print(f"{'ON2':>6}: mean {ref.mean():+8.3f}  sd {ref.std():7.3f}")
    se = ref.std() / np.sqrt(nruns) + 1e-9
    for ns in (1, 2, 10):
        e = np.array(ests[ns])
        print(f"ns={ns:3d}: mean {e.mean():+8.3f}  sd {e.std():7.3f}")
        assert np.isfinite(e).all()
        # unbiasedness within MC error and no variance blow-up even at
        # nsteps=1 — the paper's conclusion
        assert abs(e.mean() - ref.mean()) < 6.0 * se * np.sqrt(2.0), (
            ns, e.mean(), ref.mean())
        assert e.std() < 3.0 * ref.std() + 1e-6, (ns, e.std(), ref.std())
    return ests


if __name__ == "__main__":
    main()
