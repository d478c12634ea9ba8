"""Genealogy of a bootstrap filter: path degeneracy in action.

TPU-native counterpart of book/smoothing/plot_genealogy.py (Figure 11.2):
run a bootstrap filter on the DiscreteCox model with full history, trace
every surviving lineage back from the final particles, and measure when
they coalesce.  The textbook facts asserted: (a) all final particles
share a common ancestor well before the end (path degeneracy), and (b)
the number of distinct ancestors at time t shrinks as T - t grows.
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


def main(small=False):
    T = 40 if small else 100
    N = 100 if small else 500
    ssm = ssms.DiscreteCox(mu=0.0, phi=0.9, sigma=0.5)
    x, y = ssm.simulate(jax.random.key(0), T)
    pf = particles.SMC(fk=ssms.Bootstrap(ssm=ssm, data=y), N=N,
                       store_history=True, key=jax.random.key(1))
    pf.run()

    # B[t, n] = time-t ancestor of final particle n (reverse scan over A)
    A = np.asarray(pf.hist.A)                     # (T, N)
    B = np.empty((T, N), dtype=np.int64)
    B[T - 1] = np.arange(N)
    for t in range(T - 2, -1, -1):
        B[t] = A[t + 1][B[t + 1]]
    n_distinct = np.array([len(np.unique(B[t])) for t in range(T)])

    coalesce_t = int(np.argmax(n_distinct > 1))   # first t with >1 ancestor
    print(f"distinct time-0 ancestors of the {N} final particles: "
          f"{n_distinct[0]}")
    print(f"full coalescence (single common ancestor) up to t = "
          f"{coalesce_t - 1}")
    print(f"distinct ancestors at 3T/4: {n_distinct[3 * T // 4]}, "
          f"at T-1: {n_distinct[-1]}")

    # (a) path degeneracy: far fewer distinct time-0 ancestors than
    # particles (full coalescence to 1 needs large T/N ratios)
    assert n_distinct[0] <= max(1, N // 8), n_distinct[0]
    # (b) monotone-ish degeneracy: far past has (weakly) fewer ancestors
    assert n_distinct[0] <= n_distinct[T // 2] <= n_distinct[-1]
    assert n_distinct[-1] > N // 10  # the recent past is still diverse
    return n_distinct


if __name__ == "__main__":
    main()
