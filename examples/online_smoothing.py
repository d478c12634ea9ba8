"""On-line smoothing of an additive function: naive O(N) vs exact O(N^2)
vs hybrid PaRIS, on the log-Gaussian Poisson (DiscreteCox) model of
Chopin & Singh (2014).

TPU-native counterpart of book/smoothing/online_smoothing.py (Figures
12.2-12.3): all three collectors run inside the compiled filter; the
example asserts that the naive and PaRIS estimates agree with the exact
O(N^2) recursion at the final time.
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
from particles_tpu import collectors as col
from particles_tpu import state_space_models as ssms


class CoxSSM(ssms.DiscreteCox):
    """DiscreteCox + the additive function phi_t = sum_s x_s and the
    transition-density bound PaRIS' rejection sampler needs."""

    def add_func(self, t, xp, x):
        return x

    def upper_bound_log_pt(self, t):
        # N(loc, sigma) density is bounded by 1/(sigma sqrt(2 pi))
        return -0.5 * jnp.log(2 * jnp.pi * self.sigma**2)


def main(small=False):
    T = 25 if small else 60
    N = 150 if small else 400
    ssm = CoxSSM(mu=0.0, sigma=0.5, phi=0.9)
    x, y = ssm.simulate(jax.random.key(11), T)
    fk = ssms.Bootstrap(ssm=ssm, data=y)

    pf = particles.SMC(
        fk=fk, N=N, key=jax.random.key(5),
        collect=[col.Online_smooth_naive(), col.Online_smooth_ON2(),
                 col.Paris(Nparis=2)],
    )
    pf.run()
    naive = np.asarray(pf.summaries.online_smooth_naives)
    on2 = np.asarray(pf.summaries.online_smooth_ON2s)
    paris = np.asarray(pf.summaries.paris)

    print(f"final E[sum_t X_t | y_0:T]:  naive {naive[-1]:8.3f}   "
          f"O(N2) {on2[-1]:8.3f}   PaRIS {paris[-1]:8.3f}")
    # all three estimate the same smoothing expectation; the O(N^2)
    # recursion is exact given the particle system
    scale = max(1.0, abs(float(on2[-1])))
    assert abs(naive[-1] - on2[-1]) / scale < 0.35, (naive[-1], on2[-1])
    assert abs(paris[-1] - on2[-1]) / scale < 0.35, (paris[-1], on2[-1])
    # trajectories agree along the way too (naive degenerates slowly)
    assert np.mean(np.abs(paris - on2)) / scale < 0.5
    return {"naive": naive, "ON2": on2, "paris": paris}


if __name__ == "__main__":
    main()
