"""Neural decoding: bootstrap vs guided filter with a Newton-Raphson
Gaussian-approximation proposal (Koyama et al. 2010).

TPU-native counterpart of book/filtering/neurodecoding.py (Chapter 10,
Figures 10.4-10.5): the state is 3-D position + velocity (integrated
Brownian motion), the observations are Poisson spike counts with
log-linear rates.  The guided filter builds its proposal by a few Newton
steps on x -> log f(y_t|x) around the prior mean — here fully vmapped
over particles, with per-particle covariances via `VaryingCovNormal`.
The guided filter's ESS should dominate the bootstrap's.
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
from particles_tpu import distributions as dists
from particles_tpu import state_space_models as ssms

DX = 6  # 3-D position + 3-D velocity


def _trans_cov(delta, tau):
    # params may be traced (pytree leaves): build with jnp ops
    c11 = delta**3 / 3.0
    c12 = delta**2 / 2.0
    c22 = delta
    eye3 = jnp.eye(3, dtype=jnp.float32)
    top = jnp.concatenate([c11 * eye3, c12 * eye3], axis=1)
    bot = jnp.concatenate([c12 * eye3, c22 * eye3], axis=1)
    return tau**2 * jnp.concatenate([top, bot], axis=0)


class NeuralDecoding(ssms.StateSpaceModel):
    """a: (dy,) baseline log-rates; b: (dy, DX) tuning curves."""

    default_params = {"delta": 0.03, "tau": 1.0, "a": None, "b": None}

    def _F(self):
        # discretized integrated Brownian motion: position couples to
        # velocity by delta (ref book/filtering/neurodecoding.py predmean)
        idx = jnp.arange(3)
        return jnp.eye(DX, dtype=jnp.float32).at[idx, idx + 3].set(self.delta)

    def PX0(self):
        return dists.MvNormal(loc=jnp.zeros(DX), cov=jnp.eye(DX))

    def PX(self, t, xp):
        return dists.MvNormal(loc=xp @ self._F().T,
                              cov=_trans_cov(self.delta, self.tau))

    def PY(self, t, xp, x):
        rates = jnp.exp(self.a + x @ self.b.T)
        dy = self.b.shape[0]
        return dists.IndepProd(
            *[dists.Poisson(rate=rates[..., k]) for k in range(dy)])

    def proposal0(self, data):
        return self.PX0()

    def proposal(self, t, xp, data):
        """Gaussian approx of p(x_t | x_{t-1}, y_t) by 3 Newton steps on
        the log posterior (prior N(m,Q) x Poisson likelihood)."""
        y = data[t]
        m = xp @ self._F().T                       # (N, DX) prior mean
        Q = _trans_cov(self.delta, self.tau)
        Qinv = jnp.linalg.inv(Q)

        def one_particle(m_n):
            x = m_n
            for _ in range(3):
                lam = jnp.exp(self.a + self.b @ x)           # (dy,)
                grad = self.b.T @ (y - lam) - Qinv @ (x - m_n)
                H = self.b.T @ (self.b * lam[:, None]) + Qinv
                x = x + jnp.linalg.solve(H, grad)
            lam = jnp.exp(self.a + self.b @ x)
            H = self.b.T @ (self.b * lam[:, None]) + Qinv
            return x, jnp.linalg.inv(H)

        mean, cov = jax.vmap(one_particle)(m)
        return dists.VaryingCovNormal(loc=mean, cov=cov)


def main(small=False):
    T = 15 if small else 25
    N = 300 if small else 1000
    dy = 8 if small else 80
    rng = np.random.default_rng(5)
    # Koyama et al: baseline log-rates ~ N(2.5, 1), tuning rows uniform on
    # the unit sphere in R^6 (ref book/filtering/neurodecoding.py:137-141)
    a = jnp.asarray(2.5 + rng.standard_normal(dy), jnp.float32)
    b0 = rng.standard_normal((dy, DX))
    b = jnp.asarray(b0 / np.linalg.norm(b0, axis=1, keepdims=True),
                    jnp.float32)
    ssm = NeuralDecoding(a=a, b=b)
    x, y = ssm.simulate(jax.random.key(0), T)

    ess = {}
    for name, fk in [("bootstrap", ssms.Bootstrap(ssm=ssm, data=y)),
                     ("guided", ssms.GuidedPF(ssm=ssm, data=y))]:
        pf = particles.SMC(fk=fk, N=N, key=jax.random.key(1))
        pf.run()
        ess[name] = float(np.asarray(pf.summaries.ESSs).mean())
        print(f"{name:10s}: mean ESS {ess[name]:7.1f} / {N}   "
              f"logLt {float(pf.logLt):10.2f}")
        assert np.isfinite(float(pf.logLt))
    # the NR proposal adapts to the observations: much healthier ESS
    assert ess["guided"] > 1.5 * ess["bootstrap"], ess
    return ess


if __name__ == "__main__":
    main()
