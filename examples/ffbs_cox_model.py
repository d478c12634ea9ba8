"""FFBS smoothing variants on a discrete Cox (log-Gaussian Poisson) model.

TPU-native counterpart of papers/complexity_smoothing/ffbs_cox_model.py
(Dau & Chopin 2023, "On backward smoothing algorithms"): the Cox model's
Poisson observations make the transition-density upper bound loose, so
pure rejection FFBS suffers long tails — the paper's point is that the
O(N) MCMC variant and the hybrid rejection variant (bounded trials +
exact fallback) dominate the classic O(N^2) backward pass as N grows.

Here all variants are compiled backward scans over the same stored
forward pass; we check (a) all variants agree on the smoothed mean
within Monte-Carlo error, and (b) the measured device-time scaling of
O(N^2) vs the linear-cost variants as N grows.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import time

import numpy as np

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import state_space_models as ssms


class CoxWithBound(ssms.DiscreteCox):
    """Rejection FFBS needs an upper bound on the transition density; the
    Cox model's AR(1) Gaussian transition is maximised at its mode."""

    def upper_bound_log_pt(self, t):
        return -0.5 * jnp.log(2 * jnp.pi * self.sigma**2)


def main(small=False):
    T = 20 if small else 50
    Ns = (64, 128) if small else (128, 512)
    M = 32 if small else 200
    true = CoxWithBound(mu=0.5, sigma=0.5, phi=0.9)
    x, y = true.simulate(jax.random.key(0), T)

    results, times = {}, {}
    for N in Ns:
        pf = particles.SMC(fk=ssms.Bootstrap(ssm=true, data=y), N=N,
                           store_history=True, key=jax.random.key(1))
        pf.run()
        for name, fn in (
            ("ON2", lambda k: pf.hist.backward_sampling_ON2(k, M)),
            ("mcmc", lambda k: pf.hist.backward_sampling_mcmc(k, M)),
            ("reject", lambda k: pf.hist.backward_sampling_reject(
                k, M, max_trials=5 * N)),
        ):
            paths = fn(jax.random.key(2))  # compile + warmup
            np.asarray(paths)
            t0 = time.perf_counter()
            paths = fn(jax.random.key(3))
            sm = np.asarray(paths).mean(axis=1)  # forces
            times[(name, N)] = time.perf_counter() - t0
            results[(name, N)] = sm
            assert np.isfinite(sm).all()
            print(f"N={N:4d} {name:>7}: smoothed-mean[0]={sm[0]:+.3f} "
                  f"({times[(name, N)]*1e3:7.1f} ms)")

    # all variants estimate the same smoothing distribution
    Nbig = Ns[-1]
    base = results[("mcmc", Nbig)]
    for name in ("ON2", "reject"):
        diff = np.abs(results[(name, Nbig)] - base).mean()
        assert diff < 0.5, (name, diff)
    return results, times


if __name__ == "__main__":
    main()
